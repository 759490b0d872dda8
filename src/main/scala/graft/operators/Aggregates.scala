package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables
import RelationalCore.{money, stat}

/** SURVEY.md §2.4 — grouped/global/distinct/approx aggregation, grouping
  * sets, pivot, stats, collect aggregates.
  *
  * Scale discipline: every groupBy here is a hash aggregate with map-side
  * partial aggregation (one shuffle of the partial state, not the rows);
  * `ORDER BY` determinism rules per GraftQuery doc. NULL-producing margins
  * (rollup/cube) order with explicit NULLS FIRST on both sides — Spark's
  * ASC default is nulls-first, DuckDB's is nulls-last. */
object Aggregates {

  /** ROLLUP margins over (priority, status). Total is EXACT-INTEGER since
    * r9: the sf1 sweep caught the double sum drifting by a rounded cent at
    * the grand-total margin (3.75e13 cents — summation order left the
    * half-ulp safety of round(·,2)); prices are exact 2-dp decimals, so
    * the cents sum is one BIGINT and the released value one division of
    * identical integers (q12's r9 fix). */
  val q22Rollup: GraftQuery = GraftQuery.oracled(
    "q22_rollup",
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
      |       round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("double") / 100, 2)
          .as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** CUBE margins over (returnflag, linestatus). */
  val q23Cube: GraftQuery = GraftQuery.oracled(
    "q23_cube",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(money(sum($"l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** GROUPING SETS through the SQL entry point (lifecycle E2, SURVEY.md §3):
    * the same text DuckDB parses, run by Spark's ANTLR parser over temp
    * views. */
  val q24GroupingSets: GraftQuery = GraftQuery.oracled(
    "q24_grouping_sets",
    """SELECT c_mktsegment, c_nationkey, count(*) AS n
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""") { (spark, dir) =>
    Tables.views(spark, dir)
    spark.sql(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin)
  }

  /** Pivot event_type → columns (explicit value list keeps the plan static —
    * no extra distinct-scan job at scale); absent combinations filled 0 to
    * match SQL's `count(*) FILTER`. */
  val q25Pivot: GraftQuery = GraftQuery.oracled(
    "q25_pivot",
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'click')    AS click,
      |       count(*) FILTER (WHERE event_type = 'error')    AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |       count(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy($"user_id")
  }

  /** EDA stats aggregates: stddev/variance/corr/covar (SURVEY.md §2.4). */
  val q26Stats: GraftQuery = GraftQuery.oracled(
    "q26_stats",
    """SELECT l_returnflag,
      |       round(stddev_samp(l_quantity), 4)            AS sd_qty,
      |       round(var_samp(l_discount), 4)               AS var_disc,
      |       round(corr(l_quantity, l_extendedprice), 4)  AS corr_qty_price,
      |       round(covar_samp(l_quantity, l_tax), 4)      AS covar_qty_tax,
      |       round(min(l_extendedprice), 2)               AS min_price,
      |       round(max(l_extendedprice), 2)               AS max_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        stat(stddev_samp($"l_quantity")).as("sd_qty"),
        stat(var_samp($"l_discount")).as("var_disc"),
        stat(corr($"l_quantity", $"l_extendedprice")).as("corr_qty_price"),
        stat(covar_samp($"l_quantity", $"l_tax")).as("covar_qty_tax"),
        money(min($"l_extendedprice")).as("min_price"),
        money(max($"l_extendedprice")).as("max_price"))
      .orderBy($"l_returnflag")
  }

  /** Exact percentiles (linear interpolation — `percentile` in Spark ≡
    * `quantile_cont` in DuckDB). The approx variant is q29 (non-oracle). */
  val q27Percentiles: GraftQuery = GraftQuery.oracled(
    "q27_percentiles",
    """SELECT o_orderpriority,
      |       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
      |       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        stat(expr("percentile(o_totalprice, 0.25)")).as("p25"),
        stat(expr("percentile(o_totalprice, 0.50)")).as("p50"),
        stat(expr("percentile(o_totalprice, 0.75)")).as("p75"))
      .orderBy($"o_orderpriority")
  }

  /** Collect aggregates made deterministic: set-collect → sort → join
    * (collect_list/_set are order-sensitive, SURVEY.md §2.4). */
  val q28CollectSorted: GraftQuery = GraftQuery.oracled(
    "q28_collect_sorted",
    """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .groupBy($"c_nationkey")
      .agg(concat_ws(",", array_sort(collect_set($"c_mktsegment"))).as("segments"))
      .orderBy($"c_nationkey")
  }

  /** HyperLogLog++ approximate distinct — 100 TB cardinality estimation.
    * The raw estimate is not oracle-able (a different sketch than DuckDB's),
    * so the query emits the PRINT-BOTH form (the q150/q253/q465 pattern):
    * the exact count — strict-oracle'd — next to `est_within_5pct`, the
    * error-bound CONTRACT as a boolean the oracle pins to TRUE. A sketch
    * regression (estimate drifting past 2.5× its rsd) now hash-mismatches
    * at the DRIVER, not just in ScalaTest; AggregatesSpec still gates the
    * numeric bound. The exact column is the small-sf verifier — at 100 TB
    * production keeps only the estimate.
    *
    * Scale shape: both aggregates are one map-side-combined hash-agg over
    * the same scan; the HLL partial is ~KB per group. */
  val q29ApproxDistinct: GraftQuery = GraftQuery.oracled(
    "q29_approx_distinct",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
      |       CAST(1 AS BOOLEAN) AS est_within_5pct
      |FROM events GROUP BY 1 ORDER BY 1""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").cast("long").as("n_users_exact"),
        approx_count_distinct($"user_id", rsd = 0.02).as("est"))
      .select($"event_type", $"n_users_exact",
        (abs($"est".cast("double") / $"n_users_exact" - 1.0) <= 0.05)
          .as("est_within_5pct"))
      .orderBy($"event_type")
  }

  /** Exact distinct aggregates (expand + two-phase agg under the hood). */
  val q30DistinctAgg: GraftQuery = GraftQuery.oracled(
    "q30_distinct_agg",
    """SELECT event_type,
      |       count(DISTINCT user_id) AS n_users,
      |       count(*) AS n_events,
      |       round(sum(DISTINCT value), 2) AS sum_distinct_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        money(sum_distinct($"value")).as("sum_distinct_value"))
      .orderBy($"event_type")
  }

  /** Argmax/argmin + conditional and boolean aggregates: `max_by`/`min_by`
    * (which row's key wins), `count_if`, `bool_or`/`bool_and`. All one
    * hash-agg — same map-side-partial shape as q01.
    *
    * Determinism under ties: a bare max_by(arg, v) is free to return ANY
    * arg sharing the max v — unacceptable under hash-compare. The by-key is
    * therefore a (value, ±orderkey) STRUCT (lexicographic struct ordering
    * breaks ties on the unique key; negation flips the tie direction so both
    * arms prefer the LOWEST orderkey), mirrored in the oracle by DuckDB's
    * ordered-aggregate `first(arg ORDER BY v DESC, key)` form. */
  val q120ArgAggs: GraftQuery = GraftQuery.oracled(
    "q120_arg_aggs",
    """SELECT o_orderpriority,
      |       count(*) AS n_orders,
      |       first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey) AS top_order,
      |       first(o_orderkey ORDER BY o_totalprice, o_orderkey)      AS bottom_order,
      |       CAST(count_if(o_totalprice > 300000) AS BIGINT)          AS n_big,
      |       bool_or(o_orderstatus = 'F')                             AS any_final,
      |       bool_and(o_totalprice > 0)                               AS all_positive
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        max_by($"o_orderkey", struct($"o_totalprice", -$"o_orderkey")).as("top_order"),
        min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("bottom_order"),
        count_if($"o_totalprice" > 300000).as("n_big"),
        bool_or($"o_orderstatus" === "F").as("any_final"),
        bool_and($"o_totalprice" > 0).as("all_positive"))
      .orderBy($"o_orderpriority")
  }

  /** Ordered string aggregation (Spark 4 `listagg` / ANSI `WITHIN GROUP`):
    * nations per region as one delimited string. The WITHIN GROUP ordering
    * is what makes a string agg hash-comparable at all — an unordered
    * listagg is free to concatenate in any partition arrival order. */
  val q126StringAgg: GraftQuery = GraftQuery.oracled(
    "q126_string_agg",
    """SELECT n_regionkey,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       count(*) AS n
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.nation(spark, dir)
      .groupBy($"n_regionkey")
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n"))
      .orderBy($"n_regionkey")
  }

  /** Re-aggregatable distinct-count sketches (Apache DataSketches HLL):
    * build one binary sketch per (day, event_type) — the cube a 100 TB
    * pipeline precomputes ONCE per ingest day — then answer the
    * per-event-type question by UNIONING the daily sketches, never
    * re-touching raw data. This is what `approx_count_distinct` (q29)
    * cannot do: its estimate is final, while `hll_sketch_agg` materializes
    * the mergeable state, making distinct counts roll up like sums across
    * any slice (days → months, per-partition → global). Sketch bytes are
    * engine-specific, so the entry ships the PRINT-BOTH form (q29's
    * pattern): the sketch-count and exact distinct are strict-oracle'd,
    * and the two CONTRACTS — merged estimate within 5% of exact, and
    * merge-of-dailies == direct one-shot sketch — ride as booleans the
    * oracle pins to TRUE, so a merge regression hash-mismatches at the
    * driver. AggregatesSpec still gates the numeric bound. */
  val q133SketchMergeDistinct: GraftQuery = GraftQuery.oracled(
    "q133_sketch_merge_distinct",
    """SELECT event_type,
      |       CAST(count(DISTINCT CAST(date_trunc('day', date_trunc('microseconds', ts)) AS DATE)) AS BIGINT) AS n_daily_sketches,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
      |       CAST(1 AS BOOLEAN) AS merged_within_5pct,
      |       CAST(1 AS BOOLEAN) AS merge_eq_direct
      |FROM events GROUP BY 1 ORDER BY 1""") { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val merged = ev
      .groupBy(to_date($"ts").as("d"), $"event_type")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n_daily_sketches"),
        hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
    val direct = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").cast("long").as("n_users_exact"),
        hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("est_direct"))
    merged.join(direct, Seq("event_type"))
      .select($"event_type", $"n_daily_sketches", $"n_users_exact",
        (abs($"est_merged".cast("double") / $"n_users_exact" - 1.0) <= 0.05)
          .as("merged_within_5pct"),
        ($"est_merged" === $"est_direct").as("merge_eq_direct"))
      .orderBy($"event_type")
  }

  /** Rolling 7-day active users from re-aggregatable daily HLL sketches —
    * the DAU/WAU query at 100 TB. The corpus-sized work happens ONCE:
    * events collapse to one sketch row per day with map-side partial
    * aggregation; the rolling union is then a RANGE window over the
    * days-sized sketch table (365 rows/year — the unpartitioned window is
    * deliberate and safe at that cardinality), never re-touching row data.
    * The exact-rolling-distinct alternative replays every event row into 7
    * windows and shuffles the full (day, user) stream — this replaces that
    * with a few-KB sketch per day. lgK=14 ≈ 0.8% rse; AggWindowSpec gates
    * WAU ≤5% of exact rolling distinct.
    *
    * PRINT-BOTH (q29's pattern): DAU and the exact rolling WAU — a
    * day-census range join over distinct (day, user) pairs, the small-sf
    * verifier that "drops at scale" (q253's wording) — are
    * strict-oracle'd; the sketch WAU rides as the `wau_within_5pct`
    * error-bound boolean the oracle pins to TRUE, so a sketch-window
    * regression hash-mismatches at the driver. The days-sized sketch
    * window stays the 100 TB path. */
  val q145RollingActives: GraftQuery = GraftQuery.oracled(
    "q145_rolling_actives",
    """WITH du AS (SELECT DISTINCT CAST(date_trunc('day', date_trunc('microseconds', ts)) AS DATE) AS d,
      |                            user_id
      |            FROM events),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT days.d,
      |       CAST(count(DISTINCT CASE WHEN du.d = days.d THEN du.user_id END) AS BIGINT) AS dau,
      |       CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau_exact,
      |       CAST(1 AS BOOLEAN) AS wau_within_5pct
      |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
      |GROUP BY days.d
      |ORDER BY days.d""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(countDistinct($"user_id").as("dau"),
        hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .withColumn("epoch_d", datediff($"d", lit("1970-01-01").cast("date")))
    val w = Window.orderBy($"epoch_d").rangeBetween(-6, 0)
    val approx = daily
      .withColumn("wau_approx", hll_sketch_estimate(hll_union_agg($"sk").over(w)))
      .select($"d", $"dau", $"wau_approx")
    // exact rolling WAU — the verification twin ("drops at scale"):
    // each distinct (day, user) pair contributes to the 7 windows ending
    // on days d..d+6 (bounded ×7 explode), then one equi semi-join prunes
    // to observed days and one distinct-agg counts — all equi-keyed,
    // never a range join
    val du = Tables.events(spark, dir)
      .select(to_date($"ts").as("ud"), $"user_id").distinct()
    val days = du.select($"ud".as("d")).distinct()
    val exact = du
      .select(explode(sequence(lit(0), lit(6))).as("off"), $"ud", $"user_id")
      .select(date_add($"ud", $"off").as("d"), $"user_id")
      .join(days, Seq("d"), "left_semi")
      .groupBy($"d")
      .agg(countDistinct($"user_id").cast("long").as("wau_exact"))
    approx.join(exact, Seq("d"))
      .select($"d", $"dau".cast("long").as("dau"), $"wau_exact",
        (abs($"wau_approx".cast("double") / $"wau_exact" - 1.0) <= 0.05)
          .as("wau_within_5pct"))
      .orderBy($"d")
  }

  /** EXACT re-aggregatable distinct via Roaring-style bitmaps — the exact
    * twin of q133's HLL rollup, for when the count must be right, not
    * ±1%: per (event_type, day, bucket) the user ids collapse into a
    * bitmap (`bitmap_construct_agg` over bit positions; buckets span 2^15
    * ids so bitmaps stay bounded), daily partials OR together
    * (`bitmap_or_agg` — union is the bitmap merge, losslessly
    * associative), and the distinct count is the sum of per-bucket
    * popcounts. The final number is plain COUNT(DISTINCT) to DuckDB — the
    * whole rollup is SQL-oracle'd END TO END, unlike any approx variant.
    *
    * 100 TB plan: the shuffle carries fixed-size bitmap blobs per
    * (key, day, bucket), not user ids; incremental days OR into stored
    * partials without re-scanning history. Ids must be dense-ish for
    * bucket efficiency (ours are); sparse ids go through a dictionary. */
  val q150BitmapDistinct: GraftQuery = GraftQuery.oracled(
    "q150_bitmap_distinct",
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("d"),
        bitmap_bucket_number($"user_id").as("bkt"),
        bitmap_bit_position($"user_id").as("pos"))
      .groupBy($"event_type", $"d", $"bkt")
      .agg(bitmap_construct_agg($"pos").as("bm"))
      .groupBy($"event_type", $"bkt")
      .agg(bitmap_or_agg($"bm").as("bm"))
      .groupBy($"event_type")
      .agg(sum(bitmap_count($"bm")).cast("long").as("n_users"))
      .orderBy($"event_type")
  }

  /** Incremental aggregate maintenance: the per-user (count, sum) state is
    * maintained as BASE (history before the latest day) merged with DELTA
    * (the latest day only) — partials re-aggregated with `sum`, never a
    * history rescan. The oracle recomputes from scratch; matching it proves
    * the merge is exact, which is the materialized-view contract.
    *
    * 100 TB plan: this is THE pattern that makes daily metric tables
    * affordable — the nightly job scans one day, not the corpus, because
    * count/sum/min/max (and q69's Welford M2, and q133's HLL sketches)
    * carry mergeable partial state. Both branches and the merge key on
    * `user_id`, so the union re-agg adds one co-partitioned shuffle of
    * per-user partials. The cutoff derives from the data (max event day)
    * via a 1-row broadcast — no driver round-trip. */
  val q170IncrementalAgg: GraftQuery = GraftQuery.oracled(
    "q170_incremental_agg",
    """SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS total
      |FROM events GROUP BY 1 ORDER BY user_id""") { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"value", to_date(date_trunc("day", $"ts")).as("d"))
    val cutoff = ev.agg(max($"d").as("cutoff_d"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"user_id").agg(
        count(lit(1)).cast("long").as("pn"), sum($"value").as("ps"))
    val base = partials(tagged.filter($"d" < $"cutoff_d"))
    val delta = partials(tagged.filter($"d" >= $"cutoff_d"))
    base.unionByName(delta)
      .groupBy($"user_id")
      .agg(sum($"pn").as("n"), round(sum($"ps"), 2).as("total"))
      .orderBy($"user_id")
  }

  /** Sketch-based percentiles (`percentile_approx`, accuracy 10000) per
    * event_type — the mergeable quantile sketch that replaces q27's exact
    * `percentile` once a segment no longer fits the exact aggregation
    * comfortably. DuckDB's `approx_quantile` is a different sketch with
    * different answers, so the entry ships PRINT-BOTH (q29's pattern):
    * per group, the row count is strict-oracle'd and each approx quantile
    * rides as its RANK-ERROR CONTRACT — `rank(approx value) - target
    * rank| ≤ n/1000 + 1` (the sketch guarantees n/10000; the gate takes
    * 10× slack so it never flakes) — as a boolean the oracle pins TRUE.
    * The rank of the returned value is measured against the data itself
    * (one conditional count per group), so a sketch regression
    * hash-mismatches at the driver. AggWindowSpec still gates the
    * numeric error.
    *
    * 100 TB story: the sketch buffer is bounded (~accuracy entries) and
    * merges associatively across partitions — the same contract as q29's
    * HLL and q69's Welford buffer. Exact per-group percentile sorts each
    * group; this never does. The rank-check join is group-census-sized. */
  val q173ApproxPercentile: GraftQuery = GraftQuery.oracled(
    "q173_approx_percentile",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(1 AS BOOLEAN) AS p50_rank_ok,
      |       CAST(1 AS BOOLEAN) AS p95_rank_ok
      |FROM events GROUP BY 1 ORDER BY 1""") {
    (spark, dir) =>
      import spark.implicits._
      val appr = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          expr("percentile_approx(value, 0.5D, 10000)").as("p50_approx"),
          expr("percentile_approx(value, 0.95D, 10000)").as("p95_approx"))
      // tie-robust rank interval: any rank in [count(<v), count(<=v)] is
      // attributable to the returned value v — the flag passes iff that
      // interval comes within tolerance of the target rank
      def rankOk(lo: Column, hi: Column, q: Double) = {
        val tol = $"n" / 1000.0 + 1
        (lo - tol <= $"n" * q) && ($"n" * q <= hi + tol)
      }
      Tables.events(spark, dir)
        .select($"event_type", $"value")
        .join(broadcast(appr), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when($"value" < $"p50_approx", 1L).otherwise(0L)).as("lo50"),
          sum(when($"value" <= $"p50_approx", 1L).otherwise(0L)).as("hi50"),
          sum(when($"value" < $"p95_approx", 1L).otherwise(0L)).as("lo95"),
          sum(when($"value" <= $"p95_approx", 1L).otherwise(0L)).as("hi95"))
        .select($"event_type", $"n",
          rankOk($"lo50", $"hi50", 0.5).as("p50_rank_ok"),
          rankOk($"lo95", $"hi95", 0.95).as("p95_rank_ok"))
        .orderBy($"event_type")
  }

  /** Hierarchical revenue shares down the full star chain (lineitem →
    * orders → customer → nation → region): per-nation revenue with its
    * share of region and of world — the drill-down report every BI layer
    * renders as a treemap. Shares divide ROUNDED subtotals, so the
    * percentages are deterministic given the subtotal oracle identity.
    *
    * 100 TB plan: the fact scan aggregates AFTER the key-chain joins, but
    * the three dim joins (customer, nation, region) are all broadcast —
    * one fact shuffle total for the (nation) rollup; region and world
    * levels re-aggregate the 25-row nation table. */
  val q189RevenueShares: GraftQuery = GraftQuery.oracled(
    "q189_revenue_shares",
    """WITH rev AS (SELECT c.c_nationkey,
      |                    round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS nrev
      |             FROM lineitem l
      |             JOIN orders o ON l.l_orderkey = o.o_orderkey
      |             JOIN customer c ON o.o_custkey = c.c_custkey
      |             GROUP BY 1),
      |j AS (SELECT r.r_name, n.n_name, rev.nrev
      |      FROM rev JOIN nation n ON rev.c_nationkey = n.n_nationkey
      |               JOIN region r ON n.n_regionkey = r.r_regionkey),
      |reg AS (SELECT r_name, round(sum(nrev), 2) AS rrev FROM j GROUP BY 1),
      |tot AS (SELECT round(sum(nrev), 2) AS grev FROM j)
      |SELECT j.r_name, j.n_name, j.nrev,
      |       round(j.nrev / reg.rrev, 6) AS pct_of_region,
      |       round(j.nrev / tot.grev, 6) AS pct_global
      |FROM j JOIN reg USING (r_name), tot
      |ORDER BY r_name, n_name""") { (spark, dir) =>
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("nrev"))
    val j = rev
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name", $"nrev")
    val reg = j.groupBy($"r_name").agg(round(sum($"nrev"), 2).as("rrev"))
    val tot = j.agg(round(sum($"nrev"), 2).as("grev"))
    j.join(broadcast(reg), "r_name")
      .crossJoin(broadcast(tot))
      .select($"r_name", $"n_name", $"nrev",
        round($"nrev" / $"rrev", 6).as("pct_of_region"),
        round($"nrev" / $"grev", 6).as("pct_global"))
      .orderBy($"r_name", $"n_name")
  }

  /** Manual aggregate pushdown below a join: revenue per nation computed by
    * PRE-aggregating the fact table per supplier BEFORE the dim joins —
    * exact because the join key (s_suppkey) functionally determines the
    * group (nation). The oracle states the naive join-then-aggregate; the
    * engine runs the pushed-down plan and must produce identical totals.
    *
    * 100 TB plan: this is the transform that turns "shuffle 6B fact rows
    * through a join, then aggregate" into "aggregate to |suppliers| partial
    * rows, then broadcast-join the partials" — the single biggest manual
    * win on fact-to-dim rollups, and one Catalyst does NOT do for you
    * (no eager-aggregation rule in stock Spark). */
  val q191AggPushdown: GraftQuery = GraftQuery.oracled(
    "q191_agg_pushdown_join",
    """SELECT n.n_name,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST((sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
      |                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) + 50) // 100 AS BIGINT) AS revenue_cents
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""") { (spark, dir) =>
    import spark.implicits._
    // exact basis-point revenue (q12's r9 fix): the two-level partial sum
    // is now integer, so the pushed-down plan is not merely equal-modulo-
    // float-order to the naive oracle — it is equal, at every scale
    val revBp = floor($"l_extendedprice" * 100 + 0.5).cast("long") *
      (lit(100L) - floor($"l_discount" * 100 + 0.5).cast("long"))
    val partials = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("pn"),
        sum(revBp).as("prev_bp"))
    partials
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"pn").cast("long").as("n_items"), sum($"prev_bp").as("rev_bp"))
      // half-up cents on the exact bp sum (q12's r10 fix): integer div on
      // both engines — the round(double, 2) boundary class cannot occur
      .select($"n_name", $"n_items", expr("(rev_bp + 50) div 100").as("revenue_cents"))
      .orderBy($"n_name")
  }

  /** `DataFrame.transpose` (Spark 4, SPARK-47081): flip a per-status metric
    * table so metrics become rows and statuses become columns — the
    * presentation pivot for narrow summary tables. All metric columns share
    * LONG type (transpose requires a common value type); the index column's
    * VALUES become column names. Oracle: the transposed table stated
    * directly as a VALUES-shaped union of conditional aggregates.
    *
    * Scale note: transpose collects only the DISTINCT INDEX VALUES to name
    * the output columns (3 here); the metric matrix itself is the result of
    * an ordinary hash aggregate — never a wide-data collect. */
  val q209Transpose: GraftQuery = GraftQuery.oracled(
    "q209_transpose",
    """WITH m AS (SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n_orders,
      |                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
      |           FROM orders GROUP BY o_orderstatus)
      |SELECT 'n_orders' AS key,
      |       (SELECT n_orders FROM m WHERE st = 'F') AS F,
      |       (SELECT n_orders FROM m WHERE st = 'O') AS O,
      |       (SELECT n_orders FROM m WHERE st = 'P') AS P
      |UNION ALL
      |SELECT 'total_cents',
      |       (SELECT total_cents FROM m WHERE st = 'F'),
      |       (SELECT total_cents FROM m WHERE st = 'O'),
      |       (SELECT total_cents FROM m WHERE st = 'P')
      |ORDER BY key""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("total_cents"))
      .transpose($"o_orderstatus")
      .orderBy($"key")
  }

  def all: Seq[GraftQuery] = Seq(
    q22Rollup, q23Cube, q24GroupingSets, q25Pivot, q26Stats,
    q27Percentiles, q28CollectSorted, q29ApproxDistinct, q30DistinctAgg,
    q120ArgAggs, q126StringAgg, q133SketchMergeDistinct, q145RollingActives,
    q150BitmapDistinct, q170IncrementalAgg, q173ApproxPercentile,
    q189RevenueShares, q191AggPushdown, q209Transpose, q223WeightedMedian,
    q225RegressionAggs, q246OrderedSetAggs, q253HllOverlap, q310Apportionment,
    q406PercentileSelection, q442ApproxDistinctRewrite,
    q465SampledJoinEstimate)

  /** EXACT PERCENTILES BY DISTRIBUTED SELECTION — the 100 TB path to an
    * EXACT quantile that q27/q319's `percentile` cannot take: Spark's
    * exact-percentile aggregate buffers every value in one reducer, and
    * a full sort (q97) pays a corpus shuffle for two order statistics.
    * This is the classic two-scan selection: (1) histogram the integer
    * cents into 2¹⁶-wide bins (a map-side census agg) and cumulate the
    * bin counts (census-sized window) to locate, for each target rank,
    * the ONE bin that contains it; (2) rescan ONLY the rows of the needed
    * bins (partition-pruned-sized work), rank them within the bin, and
    * pick the two order statistics; interpolate. Quantiles are chosen
    * with dyadic fractions (q ∈ {1/4, 1/2, 7/8}) so h = (n−1)·q and the
    * interpolation (1−f)·a + f·b are EXACT in binary floating point —
    * the engine's selection result and DuckDB's `quantile_cont` agree
    * bit-for-bit whichever algebraically-equal formula either uses.
    *
    * 100 TB plan: two sequential scans, each a map-side hash-agg /
    * filtered projection; the only sort is within the located bins
    * (n/2¹⁶-expected rows each); no single-node value buffer, no global
    * sort, no corpus shuffle. */
  val q406PercentileSelection: GraftQuery = GraftQuery.oracled(
    "q406_percentile_selection",
    """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
      |SELECT CAST(0.25 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n,
      |       round(quantile_cont(cents, 0.25) / CAST(100 AS DOUBLE), 4) AS value FROM c
      |UNION ALL
      |SELECT CAST(0.5 AS DOUBLE), CAST(count(*) AS BIGINT),
      |       round(quantile_cont(cents, 0.5) / CAST(100 AS DOUBLE), 4) FROM c
      |UNION ALL
      |SELECT CAST(0.875 AS DOUBLE), CAST(count(*) AS BIGINT),
      |       round(quantile_cont(cents, 0.875) / CAST(100 AS DOUBLE), 4) FROM c
      |ORDER BY q""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val c = Tables.orders(spark, dir)
      .select(floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    // pass 1: 2^16-wide bin census + cumulative counts (census-sized window)
    val hist = c.groupBy(expr("cents div 65536").as("bin"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val cum = hist.select($"bin", $"cnt",
      (sum($"cnt").over(Window.orderBy($"bin")) - $"cnt").as("cum_before"))
      .localCheckpoint(true)
    val n = c.count() // driver scalar: row count only (E3)
    val quantiles = Seq(0.25, 0.5, 0.875)
    // target 0-indexed interpolation position h = (n-1)q → 1-indexed ranks
    val ranks = quantiles.flatMap { q =>
      val h = (n - 1) * q // exact: q dyadic, n-1 integer
      val lo = math.floor(h).toLong + 1
      val hi = math.min(lo + 1, n)
      Seq((q, h, lo, "lo"), (q, h, hi, "hi"))
    }.toDF("q", "h", "rank", "kind")
    // locate the bin holding each rank (census × ranks — both tiny)
    val located = broadcast(ranks).join(cum,
      $"rank" > $"cum_before" && $"rank" <= $"cum_before" + $"cnt")
      .select($"q", $"h", $"rank", $"kind", $"bin", $"cum_before")
    val needed = located.select($"bin", $"cum_before").distinct()
    // pass 2: rescan only the needed bins, rank within bin
    val inBin = c.join(broadcast(needed), expr("cents div 65536") === $"bin")
      .select($"bin", $"cum_before", $"cents",
        row_number().over(Window.partitionBy($"bin").orderBy($"cents")).as("rk_in_bin"))
      .select($"bin", ($"cum_before" + $"rk_in_bin").as("rank"), $"cents")
    val picked = located.join(inBin, Seq("bin", "rank"))
      .groupBy($"q", $"h")
      .agg(max(when($"kind" === "lo", $"cents")).as("a"),
        max(when($"kind" === "hi", $"cents")).as("b"))
    picked.select($"q",
      lit(n).as("n"),
      round(((lit(1.0) - ($"h" - floor($"h"))) * $"a" + ($"h" - floor($"h")) * $"b")
        / lit(100).cast("double"), 4).as("value"))
      .orderBy($"q")
  }

  /** SKETCH ALGEBRA for audience overlap: |A∩B| from HLL sketches alone
    * via inclusion–exclusion (est(A) + est(B) − est(A∪B)) — the
    * two-audience overlap question answered WITHOUT co-shuffling the two
    * event sets (the union happens in sketch space, q133's merge law).
    * PRINT-BOTH (q29's pattern) since r6: the exact audience sizes and
    * exact overlap are strict-oracle'd; the inclusion–exclusion estimate
    * rides as its 5% error CONTRACT plus the union-subadditivity law as
    * booleans the oracle pins TRUE. AggWindowSpec still gates the raw
    * numeric estimate.
    *
    * 100 TB plan: each arm is one map-side-combined sketch agg over its
    * filter; the merge is constant-size. The exact columns (distinct
    * counts + a semi-join) exist for verification and drop at scale. */
  val q253HllOverlap: GraftQuery = GraftQuery.oracled(
    "q253_hll_overlap",
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS exact_a,
      |       (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_b,
      |       (SELECT CAST(count(*) AS BIGINT) FROM c JOIN b USING (user_id)) AS exact_overlap,
      |       CAST(1 AS BOOLEAN) AS overlap_within_5pct,
      |       CAST(1 AS BOOLEAN) AS union_subadditive""") { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click").select($"user_id")
    val buys = ev.filter($"event_type" === "purchase").select($"user_id")
    val skA = clicks.agg(hll_sketch_agg($"user_id", lit(14)).as("sk"),
      countDistinct($"user_id").as("exact_n")).withColumn("side", lit("a"))
    val skB = buys.agg(hll_sketch_agg($"user_id", lit(14)).as("sk"),
      countDistinct($"user_id").as("exact_n")).withColumn("side", lit("b"))
    val ests = skA.unionByName(skB)
      .agg(
        hll_sketch_estimate(hll_union_agg($"sk")).as("est_union"),
        max(when($"side" === "a", hll_sketch_estimate($"sk"))).as("est_a"),
        max(when($"side" === "b", hll_sketch_estimate($"sk"))).as("est_b"),
        max(when($"side" === "a", $"exact_n")).as("exact_a"),
        max(when($"side" === "b", $"exact_n")).as("exact_b"))
    val exact = clicks.distinct().join(buys.distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("exact_overlap"))
    ests.crossJoin(exact)
      .select($"exact_a".cast("long").as("exact_a"),
        $"exact_b".cast("long").as("exact_b"),
        $"exact_overlap".cast("long").as("exact_overlap"),
        (abs(($"est_a" + $"est_b" - $"est_union") - $"exact_overlap")
          <= $"exact_overlap" * 0.05).as("overlap_within_5pct"),
        ($"est_union" <= $"est_a" + $"est_b").as("union_subadditive"))
  }

  /** Ordered-set / inverse-distribution aggregates: `median` (≡
    * percentile_cont 0.5, interpolated) vs `percentile_disc` (an ACTUAL
    * data value — the discrete inverse distribution function, which q27's
    * continuous family does not cover). The disc values are exact data
    * points, so they round deterministically; `mode()` is deliberately
    * absent — the sf0.001 corpus has a tied mode (P-status priorities),
    * and mode's tie-break is engine-defined, i.e. not oracle-able.
    *
    * Scale note: exact inverse-distribution aggs sort within the hash-agg
    * buffer per group; at extreme cardinality they swap for
    * approx_percentile (q173) with the same plan shape. */
  val q246OrderedSetAggs: GraftQuery = GraftQuery.oracled(
    "q246_ordered_set_aggs",
    """SELECT o_orderstatus,
      |       round(median(o_totalprice), 4) AS med_cont,
      |       round(quantile_disc(o_totalprice, 0.5), 2) AS med_disc,
      |       round(quantile_disc(o_totalprice, 0.9), 2) AS p90_disc
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        stat(expr("median(o_totalprice)")).as("med_cont"),
        money(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")).as("med_disc"),
        money(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")).as("p90_disc"))
      .orderBy($"o_orderstatus")
  }

  /** SQL:2003 linear-regression aggregate family (`regr_slope`,
    * `regr_intercept`, `regr_r2`, `regr_count`, `regr_avgx`, `regr_avgy`)
    * per return flag — the in-engine OLS-per-group surface (the exact-sum
    * variant with BIGINT moments is q181; this is the standard built-in).
    * Both engines implement the ISO semantics (NULL-pair elimination,
    * y-first argument order), so values agree to float precision; stat()
    * rounding (4 dp) absorbs summation-order jitter exactly as q26 does.
    *
    * Scale note: one hash aggregate — every regr_* is algebraic (six
    * running moments), so map-side partial agg ships O(groups) state. */
  val q225RegressionAggs: GraftQuery = GraftQuery.oracled(
    "q225_regression_aggs",
    """SELECT l_returnflag,
      |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      |       round(regr_slope(l_extendedprice, l_quantity), 4)       AS slope,
      |       round(regr_intercept(l_extendedprice, l_quantity), 4)   AS intercept,
      |       round(regr_r2(l_extendedprice, l_quantity), 4)          AS r2,
      |       round(regr_avgx(l_extendedprice, l_quantity), 4)        AS avg_x,
      |       round(regr_avgy(l_extendedprice, l_quantity), 4)        AS avg_y
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("n_pairs"),
        stat(expr("regr_slope(l_extendedprice, l_quantity)")).as("slope"),
        stat(expr("regr_intercept(l_extendedprice, l_quantity)")).as("intercept"),
        stat(expr("regr_r2(l_extendedprice, l_quantity)")).as("r2"),
        stat(expr("regr_avgx(l_extendedprice, l_quantity)")).as("avg_x"),
        stat(expr("regr_avgy(l_extendedprice, l_quantity)")).as("avg_y"))
      .orderBy($"l_returnflag")
  }

  /** Exact WEIGHTED median: the price at which half the shipped QUANTITY
    * sits on each side, per return flag — the weighted complement of q27's
    * unweighted percentiles. Pure integer rule: first cents value whose
    * inclusive running weight doubles past the total (2·cumw ≥ W), with a
    * unique tie-break order; rows tied on cents can straddle the boundary
    * in any order and still select the same VALUE, so the rule is
    * deterministic by construction.
    *
    * Scale note: one window (partition flag, running sum) + one hash agg —
    * no sort beyond the window's, no driver math. */
  val q223WeightedMedian: GraftQuery = GraftQuery.oracled(
    "q223_weighted_median",
    """WITH j AS (SELECT l_returnflag AS flag,
      |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |                  CAST(floor(l_quantity) AS BIGINT) AS qty,
      |                  l_orderkey, l_linenumber
      |           FROM lineitem),
      |r AS (SELECT flag, cents, qty,
      |             sum(qty) OVER (PARTITION BY flag ORDER BY cents, l_orderkey, l_linenumber
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |             sum(qty) OVER (PARTITION BY flag) AS tw
      |      FROM j)
      |SELECT flag, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT) AS wmedian_cents
      |FROM r GROUP BY flag
      |ORDER BY flag""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val j = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"),
        floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"),
        floor($"l_quantity").cast("long").as("qty"),
        $"l_orderkey", $"l_linenumber")
    val wRun = Window.partitionBy($"flag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"flag")
    j.withColumn("cw", sum($"qty").over(wRun))
      .withColumn("tw", sum($"qty").over(wAll))
      .groupBy($"flag")
      .agg(count(lit(1)).as("n"),
        min(when(lit(2) * $"cw" >= $"tw", $"cents")).as("wmedian_cents"))
      .orderBy($"flag")
  }

  /** LARGEST-REMAINDER APPORTIONMENT (Hamilton's method) — distribute an
    * INTEGER budget (1000 "seats"/slots/samples) across groups
    * proportionally to weights so the shares sum EXACTLY to the budget:
    * the integer-allocation operator behind sampling quotas, shard
    * assignment, and budget splits, where naive round(S·w/W) over- or
    * under-shoots by several units. Each nation floors its exact quota
    * (integer arithmetic: seats·n // W) and the leftover seats go to the
    * largest fractional remainders (remainder = seats·n mod W — kept as
    * an exact BIGINT, never a float), deterministic nationkey tie-break.
    * Σseats = 1000 by construction, proven by the output.
    *
    * 100 TB plan: the row-scale work is one count per group; the
    * apportionment itself runs on the group census (25 rows) where the
    * single-partition rank window is the correct plan. Exact integers
    * end-to-end — no float quota ever exists. */
  val q310Apportionment: GraftQuery = GraftQuery.oracled(
    "q310_apportionment",
    """WITH w AS (SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS n
      |           FROM customer GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tw FROM w),
      |q AS (SELECT g, n, 1000 * n // tw AS fl, 1000 * n % tw AS rem
      |      FROM w, tot),
      |l AS (SELECT CAST(1000 - sum(fl) AS BIGINT) AS leftover FROM q),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, g) AS rk FROM q)
      |SELECT r.g AS nationkey, r.n AS weight,
      |       CAST(r.fl AS BIGINT) AS floor_seats,
      |       CAST(r.rem AS BIGINT) AS remainder,
      |       CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS extra,
      |       CAST(r.fl + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
      |FROM r, l
      |ORDER BY nationkey""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Tables.customer(spark, dir)
      .groupBy($"c_nationkey".cast("long").as("g"))
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = w.agg(sum($"n").cast("long").as("tw"))
    val q = w.crossJoin(broadcast(tot))
      .select($"g", $"n",
        expr("(1000 * n) div tw").as("fl"),
        ((lit(1000) * $"n") % $"tw").as("rem"))
    val l = q.agg((lit(1000) - sum($"fl")).cast("long").as("leftover"))
    // group census is 25 rows — single-partition rank is the right plan
    val r = q.withColumn("rk", row_number().over(Window.orderBy($"rem".desc, $"g")))
    r.crossJoin(broadcast(l))
      .select($"g".as("nationkey"), $"n".as("weight"),
        $"fl".cast("long").as("floor_seats"),
        $"rem".cast("long").as("remainder"),
        when($"rk" <= $"leftover", 1).otherwise(0).as("extra"),
        ($"fl" + when($"rk" <= $"leftover", 1).otherwise(0)).cast("long").as("seats"))
      .orderBy($"nationkey")
  }

  /** APPROX-DISTINCT REWRITE demo — the [[graft.plans.RewriteApproxDistinct]]
    * optimizer rule in action: the query is written as plain
    * `count(DISTINCT tok)` but runs as a HyperLogLog++ sketch because the
    * session opted in via `spark.graft.approxDistinct.enabled`. The exact
    * row count rides alongside untouched (the rule narrows itself to
    * single-column distinct counts). The rewrite happens at OPTIMIZATION
    * time, so the result is materialized eagerly (localCheckpoint) under
    * the flag and session state is restored before returning — no other
    * catalog query ever sees the approximation flag. No SQL oracle (the
    * sketch estimate is engine-specific but deterministic);
    * ApproxRewriteSpec proves flag-off plan identity, the sketched plan
    * shape when on, and a ≤5% relative error vs the exact distinct.
    *
    * 100 TB story: this flag is the difference between a full shuffle of
    * every distinct token and a few-KB mergeable sketch per partition —
    * same dashboard SQL on both tiers. */
  /** SAMPLED-JOIN ESTIMATOR AUDIT (online-aggregation style AQP, Hellerstein
    * et al. 1997) — the third approximation family next to sketches (q29/
    * q136) and the q442 rewrite: estimate the join aggregate from a 10%
    * Bernoulli sample of the FACT side (portable md5 coin, so the sampled
    * set — and therefore the estimate — is engine-exact), Horvitz–Thompson
    * scale-up x/p, and the classical variance estimate
    * Var(T̂) = Σ x²(1−p)/p² from the sample itself → a 95% CI. The x²
    * sum is accumulated EXACTLY (DECIMAL(38,0) / HUGEINT — a double sum
    * of cents² passes 2^53 and goes order-dependent) and converted to
    * double only for the single sqrt, so the CI is bit-identical
    * cross-engine. Emits, per
    * priority, the exact total, the estimate, the signed error in ppm, the
    * CI half-width, and whether the CI covered the truth — the audit table
    * that decides if sampled dashboards are safe.
    *
    * 100 TB plan: the estimate path scans and joins 10% of the fact rows
    * (the coin is a scan-side predicate — pushed down, never a shuffle);
    * the exact path exists here as the in-query truth. */
  val q465SampledJoinEstimate: GraftQuery = GraftQuery.oracled(
    "q465_sampled_join_estimate",
    """WITH li AS (SELECT l_orderkey,
      |                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |                   CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0 AS sampled
      |            FROM lineitem),
      |j AS (SELECT o.o_orderpriority AS pri, li.cents, li.sampled
      |      FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey),
      |agg AS (SELECT pri,
      |               CAST(sum(cents) AS BIGINT) AS exact_cents,
      |               CAST(10 * sum(CASE WHEN sampled THEN cents END) AS BIGINT) AS est_cents,
      |               CAST(90 * sum(CASE WHEN sampled THEN cents * cents END) AS DOUBLE) AS var_est
      |        FROM j GROUP BY pri)
      |SELECT pri, exact_cents, est_cents,
      |       CAST((1000000 * (est_cents - exact_cents)) // exact_cents AS BIGINT) AS err_ppm,
      |       CAST(floor(1.96 * sqrt(var_est)) AS BIGINT) AS ci95_cents,
      |       abs(est_cents - exact_cents) <= CAST(floor(1.96 * sqrt(var_est)) AS BIGINT) AS covered
      |FROM agg ORDER BY pri""") { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey",
      floor($"l_extendedprice" * 100 + 0.5).cast("long").as("cents"),
      (conv(substring(md5(concat($"l_orderkey".cast("string"), lit("-"),
        $"l_linenumber".cast("string"))), 1, 8), 16, 10).cast("long") % 10 === 0)
        .as("sampled"))
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority".as("pri"))
      .agg(sum($"cents").cast("long").as("exact_cents"),
        (lit(10) * sum(when($"sampled", $"cents"))).cast("long").as("est_cents"),
        (lit(90) * sum(when($"sampled", ($"cents" * $"cents").cast("decimal(38,0)"))))
          .cast("double").as("var_est"))
      .select($"pri", $"exact_cents", $"est_cents",
        expr("(1000000 * (est_cents - exact_cents)) div exact_cents")
          .cast("long").as("err_ppm"),
        floor(lit(1.96) * sqrt($"var_est")).cast("long").as("ci95_cents"),
        (abs($"est_cents" - $"exact_cents") <=
          floor(lit(1.96) * sqrt($"var_est")).cast("long")).as("covered"))
      .orderBy($"pri")
  }

  // PRINT-BOTH (q29's pattern) since r6: n_tokens and the exact distinct
  // are strict-oracle'd; the rewrite's two CONTRACTS — the sketched answer
  // lands within HLL's 5% rsd of exact, and the flag genuinely changed the
  // answer path (est ≠ exact would be vacuous on a plan the rule skipped;
  // checked as est within bound but computed under the flag) — ride as a
  // boolean the oracle pins TRUE. ApproxRewriteSpec still asserts the
  // plan-shape (ObjectHashAggregate + HLL++) and flag-off plan identity.
  val q442ApproxDistinctRewrite: GraftQuery = GraftQuery.oracled(
    "q442_approx_distinct_rewrite",
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct_toks,
      |       CAST(1 AS BOOLEAN) AS rewrite_within_5pct
      |FROM t GROUP BY 1 ORDER BY 1""") {
    (spark, dir) =>
    import spark.implicits._
    val prevRules = spark.experimental.extraOptimizations
    val flag = graft.plans.RewriteApproxDistinct.FlagKey
    val prevFlag = spark.conf.getOption(flag)
    val sketched = try {
      if (!prevRules.contains(graft.plans.RewriteApproxDistinct))
        spark.experimental.extraOptimizations =
          prevRules :+ graft.plans.RewriteApproxDistinct
      spark.conf.set(flag, "true")
      Tables.documents(spark, dir)
        .select($"source", explode(split($"text", " ")).as("tok"))
        .groupBy($"source")
        .agg(countDistinct($"tok").as("approx_distinct_toks"),
          count(lit(1)).cast("long").as("n_tokens"))
        .localCheckpoint() // materialize UNDER the flag, then restore state
    } finally {
      spark.experimental.extraOptimizations = prevRules
      prevFlag match {
        case Some(v) => spark.conf.set(flag, v)
        case None => spark.conf.unset(flag)
      }
    }
    val exact = Tables.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source")
      .agg(countDistinct($"tok").as("exact_distinct_toks"))
    sketched.join(exact, Seq("source"))
      .select($"source", $"n_tokens",
        $"exact_distinct_toks".cast("long").as("exact_distinct_toks"),
        (abs($"approx_distinct_toks".cast("double") / $"exact_distinct_toks" - 1.0)
          <= 0.05).as("rewrite_within_5pct"))
      .orderBy($"source")
  }
}
