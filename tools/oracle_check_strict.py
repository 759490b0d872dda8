#!/usr/bin/env python3
"""Faithful mimic of the driver's DuckDB oracle hash-compare.

Key asymmetry (round-2 discovery): the driver reads OUR parquet via
pandas/pyarrow (DECIMAL -> decimal.Decimal objects, e.g. Decimal('1.50')) but
the oracle via duckdb .df() (DECIMAL -> float64 1.5). Any hash over value
string-forms then mismatches on trailing zeros even when numerically equal.
This checker reproduces that view: pandas on the engine side, DuckDB on the
oracle side, sort columns by name, canonicalize every cell to a string, sort
rows, compare the string matrices. A pass here should imply a driver pass.

Usage: python3 tools/oracle_check_strict.py <sfDir> <verifyOutDir> [only...]
       SKIP=name1,name2 to exclude entries (sf1-tier quadratic-oracle
       baselines whose DuckDB replay is hours — named in BASELINE.md).
       ORACLE_TIMEOUT=<seconds> interrupts any single DuckDB replay past
       the budget and records it as TIMEOUT (not a failure) — the sf1
       tier surfaced a 96-CPU-minute single-oracle straggler (q229's
       cell-density data quadratic); the timeout keeps one such entry
       from stalling the whole sweep.
Each line carries the oracle's wall seconds so slow replays are visible.
"""
import os, sys, json, glob, time, threading

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_s(x):
    if x is None:
        return "NULL"
    if isinstance(x, (np.ndarray,)):
        return "[" + ", ".join(cell_s(v) for v in x.tolist()) + "]"
    if isinstance(x, (list, tuple)):
        return "[" + ", ".join(cell_s(v) for v in x) + "]"
    if isinstance(x, (bytes, bytearray)):
        return bytes(x).hex()
    if isinstance(x, (float, np.floating)):
        if x != x:
            return "NaN"
        return repr(float(x))
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    try:
        if x != x:  # NaT
            return "NULL"
    except Exception:
        pass
    # DuckDB .df() widens DATE to datetime64[ns]; pandas reads Spark's date32
    # as datetime.date. The driver treats these as equal (q04 passed r01/r02
    # with this exact pairing), so print midnight timestamps in date form.
    if isinstance(x, pd.Timestamp) and x == x.normalize():
        return str(x.date())
    return str(x)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    mat = [[cell_s(x) for x in row] for row in df.itertuples(index=False, name=None)]
    mat.sort()
    return list(df.columns), mat


def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir, out_dir, only):
    con = fresh_con(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    skip = set(filter(None, os.environ.get("SKIP", "").split(",")))
    failures = 0
    n_skipped = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (named exclusion)")
            n_skipped += 1
            continue
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output parquet")
            failures += 1
            continue
        tmo = float(os.environ.get("ORACLE_TIMEOUT", "0") or 0)
        # Timeout-race guard: if the oracle finishes at ~the budget, a bare
        # Timer(con.interrupt) can fire AFTER con.sql returns but before
        # cancel(), leaving a pending interrupt that kills the NEXT entry's
        # replay. The callback now only interrupts while this query is still
        # flagged running, and any interrupt that did fire (timeout OR
        # late-fire) is followed by a fresh connection so no interrupt state
        # can leak across entries.
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
            running = threading.Event()
            fired = threading.Event()

            def _interrupt():
                if running.is_set():
                    fired.set()
                    con.interrupt()

            timer = threading.Timer(tmo, _interrupt) if tmo else None
            if timer:
                running.set()
                timer.start()
            try:
                ref = con.sql(sql).df()
            finally:
                running.clear()
                if timer:
                    timer.cancel()
                if fired.is_set():
                    con.close()
                    con = fresh_con(sf_dir)
        except Exception as e:
            if tmo and fired.is_set():
                print(f"TIMEOUT {name} (oracle > {tmo:.0f}s)", flush=True)
                n_skipped += 1
                continue
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        # The REAL driver crashes in pandas sort_values on raw bytes cells
        # ("unhashable type: bytearray") BEFORE comparing — this mimic used
        # to hex-canonicalize per cell first (line cell_s above) and so
        # green-lit exactly what the driver cannot verify (q484, round 6).
        # Reject any BINARY output column loudly instead: emit hex(col).
        # Scan FULL frames on BOTH sides (a column whose first rows are null
        # can still carry bytes later; DuckDB can also produce BLOB cells).
        def has_bytes(frame, c):
            col = frame[c]
            if col.dtype != object:
                return False
            return bool(col.map(lambda v: isinstance(v, (bytes, bytearray))).any())
        bin_cols = sorted(
            {c for c in mine.columns if has_bytes(mine, c)}
            | {c for c in ref.columns if has_bytes(ref, c)})
        if bin_cols:
            print(f"FAIL {name}: raw BINARY output column(s) {bin_cols} — "
                  "the driver's pandas compare crashes on bytes; project "
                  "hex(col) instead")
            failures += 1
            continue
        mc, mm = canon(mine)
        rc, rm = canon(ref)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} != {rc}")
            failures += 1
            continue
        if len(mm) != len(rm):
            print(f"FAIL {name}: rows {len(mm)} != {len(rm)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(mm, rm)):
            if a != b:
                diffs = [(mc[j], a[j], b[j]) for j in range(len(a)) if a[j] != b[j]]
                bad = f"row {i}: " + "; ".join(f"{c}: {x} vs {y}" for c, x, y in diffs[:3])
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            failures += 1
        else:
            print(f"OK   {name} ({len(mm)} rows, {time.time() - t0:.1f}s)", flush=True)
    n = (len(only) if only else len(oracle)) - n_skipped
    tail = f", {n_skipped} skipped" if n_skipped else ""
    print(f"== {n - failures}/{n} strict-match{tail} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
