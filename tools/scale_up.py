#!/usr/bin/env python3
"""Synthesize an sf1 tier from sf0.1 by re-keyed x10 duplication.

Round-7 verdict item #2: the scale argument ("this plan survives a 100x
scale-up") has been made by plan shape for seven rounds; this tool makes it
empirical. It builds a tier with 10x the rows of sf0.1 — 6M lineitem — with
FRESH keys per replica (referential integrity preserved: every replica's
orders point at that replica's customers, lineitems at that replica's
orders/parts/suppliers) and the SAME value domains, so per-key group sizes,
join fan-outs and filter selectivities are unchanged and a healthy
operator's cost grows ~linearly (plus a shuffle constant).

Design choices that keep the scaling measurement honest:
  * region/nation stay fixed (TPC-H semantics: dims don't scale) — the
    broadcast sides stay broadcast-size, as they would at 100 TB.
  * documents.text is token-salted per replica (tok -> tok~i for i>0):
    replica-internal near-dup structure is IDENTICAL to sf0.1, but no
    cross-replica shingle collides, so true near-dup pairs grow exactly
    10x. Plain duplication would instead grow every duplicate cluster
    10x -> pairwise evidence 100x, and the measurement would attribute a
    DATA quadratic to the engine. n_chars is recomputed for consistency.
  * embeddings are duplicated with fresh vec_ids and unchanged vectors:
    brute-force all-pairs entries are O(n^2) BY DESIGN (they are the
    documented baseline for the LSH/IVF scale path) and are expected to
    show ~100x here — that is the named cause, not a defect.
  * Key strides are powers of 10 above each sf0.1 max key, so replica
    key ranges never collide and modular-arithmetic derivations
    (doc_id % 3 PII arms, hash buckets) keep their per-replica mix.

Everything is deterministic — no RNG anywhere. DuckDB writes TIMESTAMP as
MICROS, the same physical encoding the round-4+ driver data uses, and the
engine's loaders are schema-adaptive regardless.

Usage: python3 tools/scale_up.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> target/sf1, factor 10.
"""
import os
import sys

import duckdb


def stride_above(con, path, col):
    mx = con.sql(f"SELECT max({col}) FROM read_parquet('{path}')").fetchone()[0]
    s = 10
    while s <= mx:
        s *= 10
    return s


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    p = {t: f"{src}/{t}.parquet" for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"]}
    cs = stride_above(con, p["customer"], "c_custkey")
    ss = stride_above(con, p["supplier"], "s_suppkey")
    ps = stride_above(con, p["part"], "p_partkey")
    osd = stride_above(con, p["orders"], "o_orderkey")
    es = stride_above(con, p["events"], "event_id")
    us = stride_above(con, p["events"], "user_id")
    ds = stride_above(con, p["documents"], "doc_id")
    vs = stride_above(con, p["embeddings"], "vec_id")
    print(f"strides: cust={cs} supp={ss} part={ps} order={osd} "
          f"event={es} user={us} doc={ds} vec={vs}")

    reps = f"(SELECT unnest(generate_series(0, {factor - 1})) AS i)"
    plans = {
        "region": f"SELECT * FROM read_parquet('{p['region']}')",
        "nation": f"SELECT * FROM read_parquet('{p['nation']}')",
        "customer": f"""
            SELECT c_custkey + i*{cs} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM read_parquet('{p['customer']}'), {reps}""",
        "supplier": f"""
            SELECT s_suppkey + i*{ss} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM read_parquet('{p['supplier']}'), {reps}""",
        "part": f"""
            SELECT p_partkey + i*{ps} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM read_parquet('{p['part']}'), {reps}""",
        "orders": f"""
            SELECT o_orderkey + i*{osd} AS o_orderkey,
                   o_custkey + i*{cs} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{p['orders']}'), {reps}""",
        "lineitem": f"""
            SELECT l_orderkey + i*{osd} AS l_orderkey,
                   l_partkey + i*{ps} AS l_partkey,
                   l_suppkey + i*{ss} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{p['lineitem']}'), {reps}""",
        "events": f"""
            SELECT event_id + i*{es} AS event_id, ts,
                   user_id + i*{us} AS user_id, event_type, value, props
            FROM read_parquet('{p['events']}'), {reps}""",
        "documents": f"""
            SELECT doc_id + i*{ds} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(list_transform(
                               string_split(text, ' '),
                               x -> x || '~' || CAST(i AS VARCHAR)), ' ')
                   END AS text,
                   lang, source,
                   CAST(CASE WHEN i = 0 THEN n_chars
                             ELSE len(array_to_string(list_transform(
                                    string_split(text, ' '),
                                    x -> x || '~' || CAST(i AS VARCHAR)), ' '))
                        END AS BIGINT) AS n_chars
            FROM read_parquet('{p['documents']}'), {reps}""",
        "embeddings": f"""
            SELECT vec_id + i*{vs} AS vec_id, embedding, label
            FROM read_parquet('{p['embeddings']}'), {reps}""",
    }
    for t, sql in plans.items():
        out = f"{dst}/{t}.parquet"
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if len(a) > 0 else "/root/testdata/sf0.1",
         a[1] if len(a) > 1 else "target/sf1",
         int(a[2]) if len(a) > 2 else 10)
