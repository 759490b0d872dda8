#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views named after the testdata tables, read the engine's parquet dump, sort
columns by name + rows by all columns, and compare cell-by-cell (exact for
non-floats; floats flagged if not bit-equal, with max abs diff reported).
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output parquet")
            failures += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        mine, ref = canon(mine), canon(ref)
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            failures += 1
            continue
        bad = []
        for col in mine.columns:
            mv, rv = mine[col].tolist(), ref[col].tolist()
            ndiff = sum(0 if cells_equal(x, y) else 1 for x, y in zip(mv, rv))
            if ndiff:
                ex = next((x, y) for x, y in zip(mv, rv) if not cells_equal(x, y))
                bad.append(f"{col}: {ndiff} diffs e.g. {ex[0]!r} vs {ex[1]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"OK   {name} ({len(mine)} rows, {len(mine.columns)} cols)")
    print(f"== {len(oracle) - failures}/{len(oracle)} oracle'd queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
