package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables
import RelationalCore.money

/** SURVEY.md §2.10 (100 TB design rules) — skew mitigation: salted shuffle
  * join. AQE's skew-join split handles sort-merge skew automatically; the
  * salting pattern below is the explicit engine-level tool for the cases AQE
  * can't re-plan (e.g. shuffled-hash aggregation keys, streaming state).
  *
  * Pattern: the probe (fact) side gets a deterministic pseudo-random salt in
  * [0, R); the build side is replicated R times. The join key becomes
  * (key, salt) so one hot key spreads over R reducer partitions. Results are
  * provably identical to the unsalted join — the oracle states the plain
  * join. */
object Skew {

  /** Salted equi-join: `fact ⋈ build ON factKey = buildKey` with the build
    * side replicated `replicas` times. `saltOn` must be deterministic per
    * fact row (here: xxhash64 of row identity — reproducible, uniform). */
  def saltedJoin(
      fact: DataFrame, build: DataFrame,
      factKey: Column, buildKey: Column,
      saltOn: Column, replicas: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltOn), lit(replicas)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until replicas).map(lit): _*)))
    // hint forces a shuffle join so the salt actually spreads reducers
    // (a broadcast join would make salting a no-op — correct but pointless)
    salted.join(replicated.hint("shuffle_hash"),
      factKey === buildKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Revenue per order priority through a salted lineitem⋈orders join
    * (R = 8): byte-identical to the plain join the oracle states. */
  val q70SaltedJoin: GraftQuery = GraftQuery.oracled(
    "q70_salted_join",
    """SELECT o_orderpriority,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    val fact = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
    val build = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    saltedJoin(fact, build,
      factKey = $"l_orderkey", buildKey = $"o_orderkey",
      saltOn = $"l_linenumber" * 1000000 + $"l_orderkey", replicas = 8)
      .groupBy($"o_orderpriority")
      .agg(money(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_orderpriority")
  }

  /** JOIN-KEY SKEW REPORT — the detector that decides when q70's salting
    * (or AQE's skew split) is worth paying for: per candidate shuffle key,
    * the key-frequency distribution summarized as cardinality, max/mean
    * ratio (the straggler factor — how much slower the hottest reducer
    * runs than the average), top-key share, and p99/p50 of per-key counts.
    * Exact integer counts; percentiles via the same `percentile` ≡
    * `quantile_cont` identity as q27.
    *
    * 100 TB plan: one hash-agg per audited key (map-side combined) and a
    * constant-size summary each — the report costs one scan per key
    * column and is exactly what a shuffle planner consumes. */
  val q256SkewReport: GraftQuery = GraftQuery.oracled(
    "q256_skew_report",
    """WITH lo AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
      |lp AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
      |oc AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
      |s AS (
      |  SELECT 'lineitem.l_orderkey' AS key_col, CAST(count(*) AS BIGINT) AS n_keys,
      |         CAST(max(n) AS BIGINT) AS max_n,
      |         round(max(n) / avg(n), 4) AS straggler_factor,
      |         round(max(n) * 1.0 / sum(n), 6) AS top_share,
      |         round(quantile_cont(n, 0.99) / quantile_cont(n, 0.50), 4) AS p99_over_p50
      |  FROM lo
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey', CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT),
      |         round(max(n) / avg(n), 4), round(max(n) * 1.0 / sum(n), 6),
      |         round(quantile_cont(n, 0.99) / quantile_cont(n, 0.50), 4)
      |  FROM lp
      |  UNION ALL
      |  SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT),
      |         round(max(n) / avg(n), 4), round(max(n) * 1.0 / sum(n), 6),
      |         round(quantile_cont(n, 0.99) / quantile_cont(n, 0.50), 4)
      |  FROM oc)
      |SELECT * FROM s ORDER BY key_col""") { (spark, dir) =>
    import spark.implicits._
    def report(df: org.apache.spark.sql.DataFrame, keyCol: String, label: String) =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).cast("long").as("n_keys"),
          max($"n").cast("long").as("max_n"),
          round(max($"n") / avg($"n"), 4).as("straggler_factor"),
          round(max($"n") * lit(1.0) / sum($"n"), 6).as("top_share"),
          round(expr("percentile(n, 0.99)") / expr("percentile(n, 0.50)"), 4).as("p99_over_p50"))
        .select(lit(label).as("key_col"), $"n_keys", $"max_n",
          $"straggler_factor", $"top_share", $"p99_over_p50")
    val li = Tables.lineitem(spark, dir)
    report(li, "l_orderkey", "lineitem.l_orderkey")
      .unionAll(report(li, "l_partkey", "lineitem.l_partkey"))
      .unionAll(report(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .orderBy($"key_col")
  }

  /** TWO-PHASE SALTED AGGREGATION — the skewed-GROUP-BY complement of
    * q70's salted join. `l_returnflag` has exactly 3 values over 600k rows
    * (straggler factor ≈ n/3 per reducer if hash-partitioned directly, and
    * map-side combine alone can't help when the combine ratio is already
    * maximal but the FINAL reducer for a hot key still receives one
    * partial per map task... the real case is agg states too big to
    * combine, e.g. collect/distinct states). Phase 1 aggregates on
    * (key, salt∈[0,32)) so the hot key's stream spreads over 32 reducers;
    * phase 2 merges the 32 algebraic partials per key. Identical answers
    * to the direct GROUP BY the oracle states — sum/count/avg are
    * algebraic, so partial-merge is exact.
    *
    * 100 TB plan: phase 2's input is |keys|·32 rows — trivially small; the
    * expensive shuffle is phase 1's, now salt-spread. avg must be derived
    * sum/count AFTER the merge (an avg-of-avgs would be wrong under
    * uneven salt buckets). */
  val q277SaltedAgg: GraftQuery = GraftQuery.oracled(
    "q277_salted_agg",
    """SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       round(sum(l_extendedprice * (1 - l_discount)) / count(*), 4) AS avg_net
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("net"))
      .withColumn("__salt",
        pmod(xxhash64($"l_orderkey" * 1000000 + $"l_linenumber"), lit(32)))
    val partial = li.groupBy($"l_returnflag", $"__salt")
      .agg(count(lit(1)).as("pn"), sum($"net").as("psum"))
    partial.groupBy($"l_returnflag")
      .agg(sum($"pn").cast("long").as("n_lines"),
        money(sum($"psum")).as("revenue"),
        round(sum($"psum") / sum($"pn"), 4).as("avg_net"))
      .orderBy($"l_returnflag")
  }

  /** RENDEZVOUS (highest-random-weight) SHARD ROUTING — the consistent
    * assignment scheme behind cache rings and shard routers (Thaler &
    * Ravishankar 1996): each document goes to the shard whose
    * md5(doc‖shard) weight is highest, so REMOVING a shard only moves
    * that shard's keys (no global reshuffle — the property modulo
    * hashing lacks). The output is the balance audit: per-shard doc
    * count, share, and skew factor vs the uniform ideal — the number
    * that says whether 8 shards actually hold ⅛ each.
    *
    * 100 TB plan: the candidate explode is a fixed 8× map-side
    * expansion; the argmax collapses per doc in one map-side-combined
    * max_by agg keyed on doc_id — no shuffle grows with shard count.
    * The census is shard-sized. */
  val q334RendezvousShards: GraftQuery = GraftQuery.oracled(
    "q334_rendezvous_shards",
    """WITH cand AS (SELECT doc_id, s,
      |                     md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)) AS h
      |              FROM documents, LATERAL (SELECT unnest(generate_series(0, 7)) AS s)),
      |assign AS (SELECT doc_id, arg_max(s, h) AS shard FROM cand GROUP BY doc_id),
      |cen AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs FROM assign GROUP BY 1),
      |tot AS (SELECT sum(n_docs) AS nt, count(*) AS k FROM cen)
      |SELECT CAST(cen.shard AS BIGINT) AS shard, cen.n_docs,
      |       CAST(floor(1000000.0 * cen.n_docs / tot.nt) AS BIGINT) AS share_ppm,
      |       round(cen.n_docs * tot.k / CAST(tot.nt AS DOUBLE), 4) AS skew_factor
      |FROM cen, tot
      |ORDER BY shard""") { (spark, dir) =>
    import spark.implicits._
    val cand = Tables.documents(spark, dir)
      .select($"doc_id", explode(expr("sequence(0, 7)")).as("s"))
      .withColumn("h", md5(concat($"doc_id".cast("string"), lit("#"), $"s".cast("string"))))
    val assign = cand.groupBy($"doc_id").agg(max_by($"s", $"h").as("shard"))
    val cen = assign.groupBy($"shard").agg(count(lit(1)).cast("long").as("n_docs"))
    val tot = cen.agg(sum($"n_docs").as("nt"), count(lit(1)).as("k"))
    cen.crossJoin(broadcast(tot))
      .select($"shard".cast("long").as("shard"), $"n_docs",
        floor(lit(1000000.0) * $"n_docs" / $"nt").cast("long").as("share_ppm"),
        round($"n_docs" * $"k" / $"nt".cast("double"), 4).as("skew_factor"))
      .orderBy($"shard")
  }

  /** CONSISTENT-HASH RING with virtual nodes + ELASTIC-RESIZE audit
    * (Karger et al., STOC'97) — the OTHER sharding discipline next to
    * q334's rendezvous routing: 5 shards × 8 vnodes, each vnode at token
    * md5₄₈(shard:v) on a 2⁴⁸ ring; a key lands on the first vnode
    * clockwise from md5₄₈(key) (wrap to the global minimum). The audit
    * re-runs assignment after GROWING the ring to 6 shards — existing
    * vnode tokens untouched, which is the entire point of the structure —
    * and reports per-shard key counts before/after plus the keys that
    * moved: consistency guarantees every moved key lands on the NEW shard
    * (old shards never trade keys on a grow) and the moved share is
    * ≈ vnodes_new/vnodes_total of the corpus. All integer md5 arithmetic,
    * strictly oracle'd.
    *
    * 100 TB plan: the ring is 40/48 rows broadcast; assignment is a
    * bounded non-equi probe against that broadcast (the q48 bounded-
    * broadcast shape — at most |ring| comparisons per key, no shuffle);
    * the census is one map-side-combined agg. Resize planning therefore
    * never touches the data twice: both rings ride the same scan. */
  val q434ConsistentRing: GraftQuery = GraftQuery.oracled(
    "q434_consistent_ring",
    """WITH ring1 AS (
      |  SELECT 's' || CAST(s AS VARCHAR) AS shard,
      |         CAST(('0x' || substr(md5('s' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS tok
      |  FROM UNNEST(generate_series(0, 4)) AS gs(s),
      |       UNNEST(generate_series(0, 7)) AS gv(v)),
      |ring2 AS (
      |  SELECT 's' || CAST(s AS VARCHAR) AS shard,
      |         CAST(('0x' || substr(md5('s' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS tok
      |  FROM UNNEST(generate_series(0, 5)) AS gs(s),
      |       UNNEST(generate_series(0, 7)) AS gv(v)),
      |keys AS (SELECT doc_id,
      |                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
      |         FROM documents),
      |o1 AS (SELECT k.doc_id,
      |              coalesce(
      |                min(CASE WHEN r.tok >= k.h THEN r.tok END),
      |                min(r.tok)) AS otok
      |       FROM keys k, ring1 r GROUP BY k.doc_id),
      |a1 AS (SELECT o1.doc_id, r.shard FROM o1 JOIN ring1 r ON r.tok = o1.otok),
      |o2 AS (SELECT k.doc_id,
      |              coalesce(
      |                min(CASE WHEN r.tok >= k.h THEN r.tok END),
      |                min(r.tok)) AS otok
      |       FROM keys k, ring2 r GROUP BY k.doc_id),
      |a2 AS (SELECT o2.doc_id, r.shard FROM o2 JOIN ring2 r ON r.tok = o2.otok),
      |nb AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_before FROM a1 GROUP BY 1),
      |na AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_after FROM a2 GROUP BY 1),
      |mv AS (SELECT a1.shard, CAST(count(*) AS BIGINT) AS moved_away
      |       FROM a1 JOIN a2 USING (doc_id)
      |       WHERE a1.shard <> a2.shard GROUP BY 1),
      |shards AS (SELECT DISTINCT shard FROM ring2)
      |SELECT s.shard,
      |       CAST(coalesce(nb.n_before, 0) AS BIGINT) AS n_before,
      |       CAST(coalesce(na.n_after, 0) AS BIGINT) AS n_after,
      |       CAST(coalesce(mv.moved_away, 0) AS BIGINT) AS moved_away
      |FROM shards s
      |LEFT JOIN nb USING (shard)
      |LEFT JOIN na USING (shard)
      |LEFT JOIN mv USING (shard)
      |ORDER BY s.shard""") { (spark, dir) =>
    import spark.implicits._
    def ring(nShards: Int): DataFrame =
      spark.range(nShards).select(concat(lit("s"), $"id".cast("string")).as("shard"))
        .crossJoin(spark.range(8).select($"id".cast("string").as("v")))
        .select($"shard",
          conv(substring(md5(concat($"shard", lit(":"), $"v")), 1, 12), 16, 10)
            .cast("long").as("tok"))
    def assign(keys: DataFrame, r: DataFrame): DataFrame = {
      val owners = keys.crossJoin(broadcast(r))
        .groupBy($"doc_id")
        .agg(coalesce(min(when($"tok" >= $"h", $"tok")), min($"tok")).as("otok"))
      owners.join(broadcast(r), $"otok" === $"tok").select($"doc_id", $"shard")
    }
    val keys = Tables.documents(spark, dir)
      .select($"doc_id",
        conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
    val a1 = assign(keys, ring(5)).withColumnRenamed("shard", "s1")
      .localCheckpoint()
    val a2 = assign(keys, ring(6)).withColumnRenamed("shard", "s2")
      .localCheckpoint()
    val nb = a1.groupBy($"s1".as("shard"))
      .agg(count(lit(1)).cast("long").as("n_before"))
    val na = a2.groupBy($"s2".as("shard"))
      .agg(count(lit(1)).cast("long").as("n_after"))
    val mv = a1.join(a2, "doc_id").filter($"s1" =!= $"s2")
      .groupBy($"s1".as("shard"))
      .agg(count(lit(1)).cast("long").as("moved_away"))
    ring(6).select($"shard").distinct()
      .join(nb, Seq("shard"), "left")
      .join(na, Seq("shard"), "left")
      .join(mv, Seq("shard"), "left")
      .select($"shard",
        coalesce($"n_before", lit(0L)).cast("long").as("n_before"),
        coalesce($"n_after", lit(0L)).cast("long").as("n_after"),
        coalesce($"moved_away", lit(0L)).cast("long").as("moved_away"))
      .orderBy($"shard")
  }

  def all: Seq[GraftQuery] = Seq(q70SaltedJoin, q256SkewReport, q277SaltedAgg,
    q334RendezvousShards, q434ConsistentRing)
}
