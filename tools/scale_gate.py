#!/usr/bin/env python3
"""STANDING scale gate — round-8 verdict item #3 made recurring.

Round 8 measured the 22 then-heaviest entries once (sf0.1 -> synthesized
sf1, forced, min-of-2) and recorded the table in BASELINE.md. This tool
turns that one-shot artifact into a per-round check over the CURRENT
catalog:

  1. Rank entries by their canonical count-mode sf0.1 time (the committed
     BENCH.json full map) and take the top N (default 25), plus any names
     passed on the command line.
  2. Ensure the synthesized sf1 tier exists (tools/scale_up.py; pass
     --regen to force a rebuild after a driver testdata regen — the tier
     is STALE whenever /root/testdata/sf0.1 is newer than target/sf1, and
     this tool refuses to run on a stale tier).
  3. Run the FORCED self-bench (min-of-2, every column materialized) for
     that set at both tiers. Bench writes subset/forced runs to
     BENCH_scratch.json (never the canonical BENCH.json); the two tier
     records are copied to BENCH_scale_sf01.json / BENCH_scale_sf1.json.
  4. Gate: any entry whose sf0.1->sf1 forced ratio exceeds RATIO_MAX (15x
     for 10x data) fails the run unless it is in BY_DESIGN — the named
     exact-quadratic baselines whose approximate twins are the shipped
     scale path.

BY_DESIGN entries are SKIPPED at the sf1 tier by default (their quadratic
cost is the one thing already measured and named — q482 alone is ~12 min
per forced pass at sf1); their round-8 measured rows are carried into the
printed table. Pass --full to re-measure them.

Usage: python3 tools/scale_gate.py [N] [extra_query_names...] [--regen] [--full]
"""
import json
import os
import shutil
import subprocess
import sys

RATIO_MAX = 15.0
SF01 = "/root/testdata/sf0.1"
SF1 = "target/sf1"
BY_DESIGN = {
    # entry -> (r8 measured sf0.1 s, sf1 s, named reason)
    "q482_mutual_nn": (5.73, 733.9, "exact all-pairs baseline (q50's class); scale twin q506 = 1.9x"),
    "q476_damerau_closest_pairs": (2.98, 252.1, "per-block pair CENSUS semantics on a fixed 125-key space — quadratic by definition (scaladoc re-scoped r9); pairing twin q506 = 1.9x"),
}


def run_bench(sf_dir, names, out_json):
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_FORCE="1",
               SPARK_GRAFT_BENCH_ONLY=",".join(sorted(names)),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32")
    print(f"== forced bench @ {sf_dir}: {len(names)} entries ==", flush=True)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    if r.returncode != 0:
        print(r.stdout.decode()[-3000:])
        sys.exit(f"bench failed at {sf_dir}")
    rec = json.load(open("BENCH_scratch.json"))
    if rec.get("errors"):
        sys.exit(f"bench errors at {sf_dir}: {rec['errors']}")
    shutil.copy("BENCH_scratch.json", out_json)
    return rec["queries"]


def main(argv):
    regen = "--regen" in argv
    full = "--full" in argv
    argv = [a for a in argv if not a.startswith("--")]
    n_top = int(argv[0]) if argv and argv[0].isdigit() else 25
    extra = set(argv[1:]) if argv and argv[0].isdigit() else set(argv)

    base = json.load(open("BENCH.json"))
    if base.get("mode") != "count" or len(base.get("queries", {})) < 400:
        sys.exit("BENCH.json is not the canonical full count-mode record")
    unknown = sorted(extra - set(base["queries"]))
    if unknown:
        sys.exit(f"unknown query names (not in the canonical BENCH.json map): {unknown}")
    ranked = sorted(base["queries"].items(), key=lambda kv: -kv[1])
    names = {k for k, _ in ranked[:n_top]} | extra | set(BY_DESIGN)

    if regen or not os.path.exists(f"{SF1}/lineitem.parquet"):
        subprocess.run([sys.executable, "tools/scale_up.py"], check=True)
    if os.path.getmtime(f"{SF01}/lineitem.parquet") > \
            os.path.getmtime(f"{SF1}/lineitem.parquet"):
        sys.exit("target/sf1 is STALE (testdata regenerated) — rerun with --regen")

    sf1_names = names if full else names - set(BY_DESIGN)
    t01 = run_bench(SF01, names, "BENCH_scale_sf01.json")
    t1 = run_bench(SF1, sf1_names, "BENCH_scale_sf1.json")

    rows, failures = [], []
    for name in sorted(names, key=lambda n: -t01.get(n, 0.0)):
        a = t01.get(name)
        if name in BY_DESIGN and not full:
            ra, rb, why = BY_DESIGN[name]
            rows.append((name, a, rb, rb / ra, f"by-design (carried r8 sf1 number): {why}"))
            continue
        b = t1.get(name)
        ratio = b / a if a and b is not None and a > 0.05 else float("nan")
        note = ""
        if name in BY_DESIGN:
            note = f"by-design: {BY_DESIGN[name][2]}"
        elif ratio > RATIO_MAX:
            note = f"FAIL > {RATIO_MAX}x"
            failures.append(name)
        rows.append((name, a, b, ratio, note))

    print(f"\n| entry | sf0.1 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    fmt = lambda v, p: (f"{v:.{p}f}" if isinstance(v, float) and v == v else "-")
    for name, a, b, r, note in rows:
        print(f"| {name} | {fmt(a, 2)} | {fmt(b, 1)} | {fmt(r, 1)}x | {note} |")
    if failures:
        sys.exit(f"SCALE GATE FAILED: {failures} exceeded {RATIO_MAX}x without a by-design entry")
    print(f"\nscale gate PASSED: {len(rows)} entries, none over {RATIO_MAX}x unnamed")


if __name__ == "__main__":
    main(sys.argv[1:])
