package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables
import RelationalCore.{money, stat}

/** SURVEY.md §2.5 — ranking, analytic, frame-spec window functions, and the
  * lag-gap sessionization pattern.
  *
  * Scale discipline: a window is ONE shuffle on its partition key plus a
  * partition-local sort. Heavily skewed partition keys would bottleneck a
  * single task; partition keys here (customer, user) are high-cardinality.
  * Every `orderBy` inside a window carries a unique tie-break column so
  * results are deterministic on both engines. */
object Windows {

  /** Top-K per group: row_number ≤ 3 orders per customer by price. */
  val q31TopKPerGroup: GraftQuery = GraftQuery.oracled(
    "q31_topk_per_group",
    """SELECT o_custkey, o_orderkey, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""") { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Running (cumulative) revenue per customer — rows-frame aggregate. */
  val q32RunningSum: GraftQuery = GraftQuery.oracled(
    "q32_running_sum",
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        money(sum($"o_totalprice").over(w)).as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** lag/lead analytics: inter-event gap (exact µs arithmetic — no float)
    * and next event type per user. */
  val q33LagLead: GraftQuery = GraftQuery.oracled(
    "q33_lag_lead",
    """SELECT event_id,
      |       epoch_us(date_trunc('microseconds', ts)) -
      |         lag(epoch_us(date_trunc('microseconds', ts))) OVER w AS gap_us,
      |       lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""") { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"event_id")
  }

  /** Sessionization by lag-gap (SURVEY.md §2.5): gap > 30 min starts a new
    * session; session id = running count of session starts. Batch twin of
    * the streaming `session_window` (§2.8). */
  val q34Sessionize: GraftQuery = GraftQuery.oracled(
    "q34_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts,
      |         CASE WHEN epoch_us(date_trunc('microseconds', ts)) -
      |                   lag(epoch_us(date_trunc('microseconds', ts))) OVER w
      |                   > 30 * 60 * 1000000 THEN 1
      |              WHEN lag(event_id) OVER w IS NULL THEN 1
      |              ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts) AS session_start, max(ts) AS session_end
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""") { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_session",
        when($"prev_us".isNull, 1)
          .when(unix_micros($"ts") - $"prev_us" > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_session").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"), max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** RANGE frame over event-time: trailing-30-day order count per customer.
    * Value-based frame → deterministic regardless of tie order. Expressed
    * through the SQL entry point (DataFrame rangeBetween only takes longs). */
  val q35RangeFrame: GraftQuery = GraftQuery.oracled(
    "q35_range_frame",
    """SELECT o_custkey, o_orderkey,
      |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
      |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_last_30d
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""") { (spark, dir) =>
    Tables.views(spark, dir)
    spark.sql(
      """SELECT o_custkey, o_orderkey,
        |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_last_30d
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** Rank-family showcase: dense_rank, ntile, percent_rank over a total
    * order (unique tie-break ⇒ deterministic deciles).
    *
    * SCALE CAVEAT: an un-partitioned window funnels all rows through ONE
    * task — fine for a dimension-sized input like `customer`, wrong for a
    * fact table. At 100 TB, global ranks come from a two-phase plan instead:
    * `ntile`-style deciles via approx quantile boundaries + a map-side
    * bucket assignment, or rank within range-partitioned chunks + offset by
    * per-chunk counts. */
  val q36RankFamily: GraftQuery = GraftQuery.oracled(
    "q36_rank_family",
    """SELECT c_custkey,
      |       dense_rank()   OVER w AS dr,
      |       ntile(10)      OVER w AS decile,
      |       round(percent_rank() OVER w, 6) AS pr
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val w = Window.orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_custkey",
        dense_rank().over(w).as("dr"),
        ntile(10).over(w).as("decile"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy($"c_custkey")
  }

  /** q36's rank family computed two-phase — the 100 TB shape its caveat
    * promises, with the identical oracle. Phase 1: bin rows by a DETERMINISTIC
    * monotone function of the sort key (value bucket = floor(acctbal/500),
    * the same static-binning trick as q19's range join) and rank locally
    * inside each bin — every bin ranks in parallel, no global single-task
    * funnel. Phase 2: cumulative per-bin counts (a ≤#bins-row table — the
    * only single-task window) broadcast back as offsets; global row_number =
    * offset + local rank. dense_rank ≡ that row number because the sort key
    * is unique; ntile(10) and percent_rank are recovered arithmetically from
    * (rn, N) using ntile's first-buckets-get-the-remainder rule.
    *
    * Deliberately NOT `repartitionByRange` + `spark_partition_id()`: this
    * DataFrame is consumed twice (rank branch + counts branch) and Catalyst
    * recomputes the subtree per consumer — two independently-sampled range
    * exchanges could pick different boundaries, de-syncing counts from
    * ranks. A pure per-row bucket function is identical on every
    * recomputation by construction. At 100 TB the static splits come from a
    * quantile sketch over a sample instead of a hard-coded width, but stay
    * constants in the plan, preserving the determinism. */
  val q97RankTwoPhase: GraftQuery = GraftQuery.oracled(
    "q97_rank_two_phase",
    """SELECT c_custkey,
      |       dense_rank()   OVER w AS dr,
      |       ntile(10)      OVER w AS decile,
      |       round(percent_rank() OVER w, 6) AS pr
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val binned = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_acctbal")
      .withColumn("bkt", floor($"c_acctbal" / 500.0)) // monotone, pure → safe to recompute
    val wLocal = Window.partitionBy($"bkt").orderBy($"c_acctbal".desc, $"c_custkey")
    val local = binned.withColumn("lrn", row_number().over(wLocal).cast("long"))
    val wBkt = Window.orderBy($"bkt".desc) // rank order is acctbal DESC → highest bin first
    val offsets = local.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      .select($"bkt",
        (sum($"cnt").over(wBkt) - $"cnt").as("off"),
        sum($"cnt").over(
          wBkt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("total"))
    local.join(broadcast(offsets), Seq("bkt"))
      .withColumn("rn", $"off" + $"lrn")
      .withColumn("base", floor($"total" / 10).cast("long"))
      .withColumn("rem", $"total" % 10)
      .withColumn("cut", $"rem" * ($"base" + 1)) // rows covered by the rem larger buckets
      .select($"c_custkey",
        $"rn".cast("int").as("dr"),
        when($"rn" <= $"cut", floor(($"rn" - 1) / ($"base" + 1)) + 1)
          .otherwise($"rem" + floor(($"rn" - $"cut" - 1) / $"base") + 1)
          .cast("int").as("decile"),
        round(($"rn" - 1).cast("double") / ($"total" - 1), 6).as("pr"))
      .orderBy($"c_custkey")
  }

  /** Time-series resampling to a regular grid with forward-fill — the
    * gap-repair op every metrics/feature pipeline needs before windowed
    * models: per user, an hourly grid spans [first, last] event hour; each
    * bucket takes its LAST observation (arg-max by the unique event_id —
    * deterministic on both engines), and empty buckets carry the previous
    * value forward (`last(v, ignoreNulls)` over an unbounded-preceding
    * frame).
    *
    * 100 TB plan: grid generation is one tiny per-user bounds agg + a
    * bounded explode (hours between first/last activity — output-sized,
    * never a cross join against a global calendar); the fill is one window
    * shuffle on user_id, high-cardinality by construction. Nothing touches
    * the driver. */
  val q139ResampleFfill: GraftQuery = GraftQuery.oracled(
    "q139_resample_ffill",
    """WITH e AS (SELECT user_id, event_id, value,
      |                  date_trunc('hour', date_trunc('microseconds', ts)) AS h
      |           FROM events),
      |hourly AS (SELECT user_id, h, arg_max(value, event_id) AS v FROM e GROUP BY 1, 2),
      |bounds AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM e GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds)
      |SELECT g.user_id, g.h,
      |       round(last_value(hv.v IGNORE NULLS) OVER (
      |         PARTITION BY g.user_id ORDER BY g.h ROWS UNBOUNDED PRECEDING), 2) AS v,
      |       CASE WHEN hv.v IS NULL THEN 0 ELSE 1 END AS observed
      |FROM grid g LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
      |ORDER BY g.user_id, g.h""") { (spark, dir) =>
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value", date_trunc("hour", $"ts").as("h"))
    val hourly = e.groupBy($"user_id", $"h")
      .agg(max_by($"value", $"event_id").as("v"))
    val grid = e.groupBy($"user_id").agg(min($"h").as("lo"), max($"h").as("hi"))
      .select($"user_id", explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select($"user_id", $"h",
        money(last($"v", ignoreNulls = true).over(w)).as("v"),
        when($"v".isNull, 0).otherwise(1).as("observed"))
      .orderBy($"user_id", $"h")
  }

  /** Positional window values over a full-partition ROWS frame: each
    * supplier's 1st/2nd/3rd shipment price in strict (shipdate, orderkey,
    * linenumber) order via `first_value`/`nth_value` with UNBOUNDED
    * PRECEDING..UNBOUNDED FOLLOWING — the frame shape q31–q36 don't
    * exercise (nth_value needs the whole partition visible, unlike the
    * running frames). Collapsed to one row per supplier.
    *
    * 100 TB note: a full-partition frame materializes each partition in
    * the window operator — fine keyed by supplier (bounded group size);
    * the q158 bounded-heap aggregator is the swap if the positional read
    * is only needed for small k, which avoids the frame entirely. */
  val q190NthValue: GraftQuery = GraftQuery.oracled(
    "q190_nth_value_frame",
    """SELECT DISTINCT l_suppkey,
      |       round(first_value(l_extendedprice) OVER w, 2) AS first_price,
      |       round(nth_value(l_extendedprice, 2) OVER w, 2) AS second_price,
      |       round(nth_value(l_extendedprice, 3) OVER w, 2) AS third_price
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_suppkey""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .select($"l_suppkey",
        round(first($"l_extendedprice").over(w), 2).as("first_price"),
        round(nth_value($"l_extendedprice", 2).over(w), 2).as("second_price"),
        round(nth_value($"l_extendedprice", 3).over(w), 2).as("third_price"))
      .distinct()
      .orderBy($"l_suppkey")
  }

  /** Native `session_window` in BATCH mode — the same merging-session
    * operator q63 exercises on a stream, applied to the static table. The
    * gap rule differs from q34's lag-gap sessionization on the boundary:
    * a session spans [first_ts, last_ts + gap), so an event landing EXACTLY
    * gap after its predecessor starts a NEW session (>=, where q34 uses >) —
    * the oracle's CASE spells the >= out. session_end = last event + gap,
    * per Spark's session-window contract.
    *
    * Scale note: plans as one hash-partition shuffle on user_id plus a
    * partition-local sort-merge of overlapping windows (UpdatingSessionsExec)
    * — identical shape to the lag-gap formulation, arrived at declaratively. */
  val q200SessionWindowBatch: GraftQuery = GraftQuery.oracled(
    "q200_session_window_batch",
    """WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
      |m AS (SELECT user_id, ts,
      |             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30 * 60 * 1000000
      |                  THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts,
      |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM m)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("session_start"),
        $"sw.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** q31's workload through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.TopKPerGroup]]): same top-3-per-customer result, but
    * the plan is Exchange → TopKPerGroupExec — per-partition bounded heaps
    * instead of Exchange → Sort → Window → Filter. The in-query requires
    * prove the operator planned (TopKPerGroupExec present), that NO sort
    * was inserted before it, and that exactly one shuffle feeds it. Output
    * drops the rank (heaps don't number rows) and re-sorts for
    * presentation; cents are exact.
    *
    * 100 TB plan: O(n log k) heap pushes, k·groups resident rows, no
    * sort-spill — the asymptotic win over the window formulation that
    * q158's typed Aggregator achieves at the API level, here expressed as
    * a first-class Catalyst operator (strategy registered via
    * `spark.experimental.extraStrategies`). */
  val q218TopkNative: GraftQuery = GraftQuery.oracled(
    "q218_topk_native",
    """SELECT o_custkey, o_orderkey,
      |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, cents DESC, o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    val top = graft.plans.TopKPerGroup.topK(
      Tables.orders(spark, dir),
      groupCols = Seq("o_custkey"),
      sort = Seq("o_totalprice" -> true, "o_orderkey" -> false),
      k = 3)
    // executedPlan = after EnsureRequirements (sparkPlan predates the
    // Exchange insertion); string checks see through the AQE wrapper.
    val phys = top.queryExecution.executedPlan.toString
    require(phys.contains("TopKPerGroup"), "custom TopKPerGroupExec must plan")
    require(!phys.contains("Sort"),
      "no SortExec may appear — the heap replaces the sort")
    require("Exchange hashpartitioning".r.findAllIn(phys).size == 1,
      "exactly one hash Exchange must feed the operator")
    top.select($"o_custkey", $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      .orderBy($"o_custkey", $"cents".desc, $"o_orderkey")
  }

  /** `session_window` with a DYNAMIC per-event gap (purchases hold a
    * session open 60 min, everything else 30 min) — the per-event-type
    * timeout every product-analytics stack eventually needs. Dynamic-gap
    * sessions are INTERVAL MERGING, not lag-gap: each event spans
    * [ts, ts+gap(e)) and a new session starts only when ts clears the
    * RUNNING MAX of all previous ends — the oracle states exactly that
    * (running max over a 1-PRECEDING frame, break on >=, the same
    * boundary q200 pins for the fixed-gap case).
    *
    * Scale note: same single user_id shuffle + partition-local merge as
    * fixed-gap session windows; the gap expression is evaluated per row
    * inside the session operator — no extra pass. */
  val q219SessionDynamicGap: GraftQuery = GraftQuery.oracled(
    "q219_session_dynamic_gap",
    """WITH e AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts,
      |                  CASE WHEN event_type = 'purchase' THEN 3600 ELSE 1800 END AS gap_s
      |           FROM events),
      |x AS (SELECT user_id, event_id, ts,
      |             epoch_us(ts) + CAST(gap_s AS BIGINT) * 1000000 AS end_us FROM e),
      |r AS (SELECT user_id, event_id, ts, end_us,
      |             max(end_us) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
      |      FROM x),
      |f AS (SELECT user_id, event_id, ts,
      |             CASE WHEN prev_max_end IS NULL OR epoch_us(ts) >= prev_max_end
      |                  THEN 1 ELSE 0 END AS brk
      |      FROM r),
      |s AS (SELECT user_id, ts,
      |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM f)
      |SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts",
        when($"event_type" === "purchase", "1 hour").otherwise("30 minutes"))
        .as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("session_start"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** 30-min lag-gap session census per user (q34's rule, aggregated). */
  private def sessionCensus(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import ev.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_session",
        when($"prev_us".isNull, 1)
          .when(unix_micros($"ts") - $"prev_us" > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_session").over(wRun))
      .groupBy($"user_id")
      .agg(max($"session_id").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** INCREMENTAL sessionization — the materialized-view maintenance shape
    * for q34: history sessions are already computed; a new day of events
    * arrives; only AFFECTED users (those present in the delta) are
    * re-sessionized over their full span, and everyone else's stored
    * census is reused untouched. The oracle is the full recompute, so the
    * merge law `incremental ≡ full` is proven, not assumed (q170's
    * incremental-aggregate contract, extended to stateful windows).
    *
    * 100 TB plan: the delta's user set is a fraction of the corpus, so
    * the expensive window sort runs over |affected users' events|, not
    * |history|; the untouched census is a stored table (here re-derived
    * from the pre-cut slice to stay self-contained) joined by anti-semi —
    * no window over it. This is how per-entity session state is actually
    * maintained daily at fleet scale. */
  val q255IncrementalSessions: GraftQuery = GraftQuery.oracled(
    "q255_incremental_sessions",
    """WITH flagged AS (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts,
      |         CASE WHEN epoch_us(date_trunc('microseconds', ts)) -
      |                   lag(epoch_us(date_trunc('microseconds', ts))) OVER w
      |                   > 30 * 60 * 1000000 THEN 1
      |              WHEN lag(event_id) OVER w IS NULL THEN 1
      |              ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_id,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sessions
      |GROUP BY user_id
      |ORDER BY user_id""") { (spark, dir) =>
    import spark.implicits._
    val cut = lit("2024-01-20").cast("timestamp")
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts")
    val affected = ev.filter($"ts" >= cut).select($"user_id").distinct()
    val untouched = sessionCensus(ev.filter($"ts" < cut))
      .join(affected, Seq("user_id"), "left_anti")
    val recomputed = sessionCensus(
      ev.join(broadcast(affected), Seq("user_id"), "left_semi"))
    untouched.unionByName(recomputed)
      .orderBy($"user_id")
  }

  /** Hourly resample with LINEAR INTERPOLATION — q139's grid, but gaps
    * fill with the line between the straddling observations instead of a
    * held value: v(h) = pv + (nv−pv)·(h−ph)/(nh−ph), where (ph, pv) is the
    * last observation at-or-before h (IGNORE NULLS running frame) and
    * (nh, nv) the first at-or-after (mirrored frame). Edges clamp to the
    * nearest observation. EVERYTHING is integer: hour distances are
    * epoch-µs DIV 3600·10⁶, values scale to cents, and the interpolated
    * value is the exact integer milli-cent quotient
    * (pv·(nh−hx) + nv·(hx−ph))·1000 // (nh−ph) — no float rounding
    * boundary exists anywhere (the q202/q210 exact-arithmetic rule).
    *
    * 100 TB plan: identical budget to q139 — one bounded grid explode,
    * one left join, two frames over the same user_id sort (Spark plans
    * one Window node per direction, one shuffle total). */
  val q264LinearInterp: GraftQuery = GraftQuery.oracled(
    "q264_linear_interp",
    """WITH e AS (SELECT user_id, event_id, value,
      |                  date_trunc('hour', date_trunc('microseconds', ts)) AS h
      |           FROM events),
      |hourly AS (SELECT user_id, h, arg_max(value, event_id) AS v FROM e GROUP BY 1, 2),
      |bounds AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM e GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
      |j AS (SELECT g.user_id, g.h, hv.v,
      |             epoch_us(g.h) // 3600000000 AS hx
      |      FROM grid g LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h),
      |jc AS (SELECT user_id, h, v, hx,
      |              CASE WHEN v IS NULL THEN NULL
      |                   ELSE CAST(floor(v * 100 + 0.5) AS BIGINT) END AS vc
      |       FROM j),
      |fr AS (SELECT user_id, h, v, hx,
      |              last_value(vc IGNORE NULLS) OVER wp AS pv,
      |              last_value(CASE WHEN vc IS NOT NULL THEN hx END IGNORE NULLS) OVER wp AS ph,
      |              first_value(vc IGNORE NULLS) OVER wn AS nv,
      |              first_value(CASE WHEN vc IS NOT NULL THEN hx END IGNORE NULLS) OVER wn AS nh
      |       FROM jc
      |       WINDOW wp AS (PARTITION BY user_id ORDER BY hx ROWS UNBOUNDED PRECEDING),
      |              wn AS (PARTITION BY user_id ORDER BY hx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, h,
      |       CAST(CASE WHEN pv IS NULL THEN nv * 1000
      |                 WHEN nv IS NULL THEN pv * 1000
      |                 WHEN nh = ph THEN pv * 1000
      |                 ELSE (pv * (nh - hx) + nv * (hx - ph)) * 1000 // (nh - ph) END AS BIGINT) AS v_interp_mc,
      |       CASE WHEN v IS NULL THEN 0 ELSE 1 END AS observed
      |FROM fr
      |ORDER BY user_id, h""") { (spark, dir) =>
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"value", date_trunc("hour", $"ts").as("h"))
    val hourly = e.groupBy($"user_id", $"h")
      .agg(max_by($"value", $"event_id").as("v"))
    val grid = e.groupBy($"user_id").agg(min($"h").as("lo"), max($"h").as("hi"))
      .select($"user_id", explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("h"))
    val j = grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("hx", expr("unix_micros(h) DIV 3600000000"))
      .withColumn("vc", when($"v".isNotNull, floor($"v" * 100 + 0.5).cast("long")))
    val wp = Window.partitionBy($"user_id").orderBy($"hx")
      .rowsBetween(Window.unboundedPreceding, 0)
    // forward-looking pair via a DESCENDING running frame: Spark evaluates
    // [CURRENT ROW, UNBOUNDED FOLLOWING] frames by re-aggregating from
    // scratch per row — O(rows²) per partition, measured 50 s forced at
    // sf0.1 — while the equivalent last(...) over the reverse sort is the
    // O(rows) running-frame path (3 s forced). Same one shuffle; the
    // second Window node only re-sorts within partitions.
    val wpDesc = Window.partitionBy($"user_id").orderBy($"hx".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    j.select($"user_id", $"h", $"v", $"hx",
        last($"vc", ignoreNulls = true).over(wp).as("pv"),
        last(when($"vc".isNotNull, $"hx"), ignoreNulls = true).over(wp).as("ph"),
        last($"vc", ignoreNulls = true).over(wpDesc).as("nv"),
        last(when($"vc".isNotNull, $"hx"), ignoreNulls = true).over(wpDesc).as("nh"))
      .select($"user_id", $"h",
        when($"pv".isNull, $"nv" * 1000)
          .when($"nv".isNull, $"pv" * 1000)
          .when($"nh" === $"ph", $"pv" * 1000)
          .otherwise(expr("(pv * (nh - hx) + nv * (hx - ph)) * 1000 DIV (nh - ph)"))
          .cast("long").as("v_interp_mc"),
        when($"v".isNull, 0).otherwise(1).as("observed"))
      .orderBy($"user_id", $"h")
  }

  /** EXACT ROLLING MEDIAN + IQR — the outlier-robust rolling band q230's
    * rolling z-score (mean ± σ, skew-fragile) cannot give: per user, the
    * exact median and interquartile range of the trailing 21 events. The
    * distribution aggregates evaluate per row over a BOUNDED 21-row frame
    * — O(w log w) per row with w fixed at 21, a deliberate, documented
    * cost (this is NOT a current-row-to-unbounded frame, the O(n²) class
    * the catalog bans; full-span and bounded frames are the two allowed
    * shapes). Identical linear-interpolation percentile definition on
    * both engines (q167's precedent).
    *
    * 100 TB plan: one shuffle by user, one in-partition sort, then
    * constant work per row. For w in the thousands, swap the re-scan for
    * a two-heap/indexable-skiplist `transformWithState` (q206's family);
    * at w=21 the frame re-scan is faster than any state structure. */
  val q314RollingMedian: GraftQuery = GraftQuery.oracled(
    "q314_rolling_median",
    """SELECT user_id, event_id, round(value, 2) AS value,
      |       round(quantile_cont(value, 0.5) OVER w, 4) AS roll_med,
      |       round(quantile_cont(value, 0.75) OVER w
      |             - quantile_cont(value, 0.25) OVER w, 4) AS roll_iqr
      |FROM (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, value FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-20, 0)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .select($"user_id", $"event_id", round($"value", 2).as("value"),
        round(percentile($"value", lit(0.5)).over(w), 4).as("roll_med"),
        round(percentile($"value", lit(0.75)).over(w)
          - percentile($"value", lit(0.25)).over(w), 4).as("roll_iqr"))
      .orderBy($"user_id", $"event_id")
  }

  def all: Seq[GraftQuery] = Seq(
    q31TopKPerGroup, q32RunningSum, q33LagLead, q34Sessionize,
    q35RangeFrame, q36RankFamily, q97RankTwoPhase, q139ResampleFfill,
    q190NthValue, q200SessionWindowBatch, q218TopkNative,
    q219SessionDynamicGap, q255IncrementalSessions, q264LinearInterp,
    q314RollingMedian)
}
