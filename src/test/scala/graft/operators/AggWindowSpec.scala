package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.sources.Tables

/** Non-oracle correctness gates for §2.4/§2.5 ops (SURVEY.md §5). */
class AggWindowSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("approx_count_distinct is within 5% of exact per event_type") {
    import spark.implicits._
    // raw sketch gate — the catalog entry now emits the CONTRACT as a
    // driver-oracle'd boolean; this checks the numbers behind the flag
    val approx = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$k: approx $a vs exact $e")
    }
    // and the entry's driver-facing flags are all true
    Aggregates.q29ApproxDistinct.fn(spark, sf).collect()
      .foreach(r => assert(r.getAs[Boolean]("est_within_5pct"),
        s"${r.getString(0)}: est_within_5pct is false"))
  }

  test("hll sketch union: daily-merged estimate tracks exact and the unpartitioned sketch") {
    import spark.implicits._
    val merged = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d"), $"event_type")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    for ((k, e) <- exact) {
      assert(math.abs(merged(k).toDouble - e) / e <= 0.05,
        s"$k: merged sketch ${merged(k)} vs exact $e")
      // union of same-lgK partials must agree with the one-shot sketch
      assert(math.abs(merged(k).toDouble - direct(k)) / direct(k) <= 0.005,
        s"$k: merged ${merged(k)} vs direct ${direct(k)}")
    }
    // the entry's driver-facing contract flags are all true
    Aggregates.q133SketchMergeDistinct.fn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("merged_within_5pct"), s"${r.getString(0)}: bound flag false")
      assert(r.getAs[Boolean]("merge_eq_direct"), s"${r.getString(0)}: merge law flag false")
    }
  }

  test("sessionize: session event counts sum to total events, gaps respected") {
    import spark.implicits._
    val sessions = Windows.q34Sessionize.fn(spark, sf).cache()
    val totalEvents = Tables.events(spark, sf).count()
    assert(sessions.agg(sum($"n_events")).head.getLong(0) === totalEvents)
    // session bounds are ordered and per-user session ids are dense from 1
    val perUser = sessions.groupBy($"user_id")
      .agg(min($"session_id").as("lo"), max($"session_id").as("hi"), count(lit(1)).as("n"))
    assert(perUser.filter($"lo" =!= 1 || $"hi" =!= $"n").count() === 0)
    sessions.unpersist()
  }

  test("as-of join: every asof order predates its event") {
    import spark.implicits._
    val asof = Joins.q20AsofJoin.fn(spark, sf).withColumnRenamed("user_id", "asof_user")
    val joined = asof
      .join(Tables.orders(spark, sf), $"asof_orderkey" === $"o_orderkey")
      .join(Tables.events(spark, sf), Seq("event_id"))
    assert(joined.filter($"o_orderdate" > $"ts").count() === 0)
    assert(joined.filter($"o_custkey" =!= $"asof_user" || $"user_id" =!= $"asof_user").count() === 0)
  }

  test("binned range join equals naive theta join at smoke scale") {
    import spark.implicits._
    val binned = Joins.q19RangeJoinBinned.fn(spark, sf)
    val s = Tables.supplier(spark, sf)
    val c = Tables.customer(spark, sf)
    val naive = s.join(c,
        $"c_acctbal" >= $"s_acctbal" - 10 && $"c_acctbal" <= $"s_acctbal" + 10)
      .groupBy($"s_suppkey").agg(count(lit(1)).as("n_matches"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = binned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
  }

  test("rolling 7-day actives: sketch-window WAU within 5% of exact rolling distinct") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // raw sketch-window WAU (the 100 TB path), gated against an
    // independently-computed exact rolling distinct
    val rolled = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d"))
      .agg(countDistinct($"user_id").as("dau"),
        hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .withColumn("epoch_d", datediff($"d", lit("1970-01-01").cast("date")))
      .withColumn("wau", hll_sketch_estimate(hll_union_agg($"sk").over(
        Window.orderBy($"epoch_d").rangeBetween(-6, 0))))
      .select($"d", $"dau", $"wau")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // exact rolling distinct: day grid x distinct (day, user) pairs in range
    val pairs = Tables.events(spark, sf)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    val exact = pairs.select($"d".as("d0")).distinct()
      .join(pairs, datediff($"d0", $"d").between(0, 6))
      .groupBy($"d0").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rolled.map(_._1).toSet === exact.keySet)
    for ((d, dau, wau) <- rolled) {
      val e = exact(d)
      assert(math.abs(wau.toDouble - e) / e <= 0.05,
        s"$d: sketch WAU $wau vs exact rolling distinct $e")
      assert(wau >= dau * 95 / 100, s"$d: WAU $wau implausibly below DAU $dau")
    }
    // the catalog entry's exact column matches this recomputation and its
    // driver-facing bound flag is true everywhere
    val entry = Aggregates.q145RollingActives.fn(spark, sf).collect()
    for (r <- entry) {
      assert(r.getAs[Long]("wau_exact") === exact(r.getDate(0).toString))
      assert(r.getAs[Boolean]("wau_within_5pct"),
        s"${r.getDate(0)}: wau_within_5pct is false")
    }
  }

  test("q173 approx percentile: returned values sit within 1% of target rank") {
    import spark.implicits._
    // The sketch guarantee is on RANK, not value: percentile_approx returns
    // an actual data value whose rank is within accuracy⁻¹ of the target —
    // in a sparse tail adjacent values can be far apart, so a value-distance
    // gate would be testing the data, not the sketch.
    val approx = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(expr("percentile_approx(value, 0.5D, 10000)").as("p50"),
        expr("percentile_approx(value, 0.95D, 10000)").as("p95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sf).select($"event_type", $"value").cache()
    try {
      for ((k, (a50, a95)) <- approx; (q, a) <- Seq(0.5 -> a50, 0.95 -> a95)) {
        val grp = ev.filter($"event_type" === k)
        val n = grp.count().toDouble
        val atOrBelow = grp.filter($"value" <= a).count().toDouble
        val below = grp.filter($"value" < a).count().toDouble
        // the target rank must fall within the value's rank span, ±1%
        assert(below / n - 0.01 <= q && q <= atOrBelow / n + 0.01,
          s"$k p$q: approx value $a covers rank [${below / n}, ${atOrBelow / n}]")
      }
    } finally ev.unpersist()
    // the catalog entry's driver-facing rank-contract flags are all true
    Aggregates.q173ApproxPercentile.fn(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok"), s"${r.getString(0)}: p50 flag false")
      assert(r.getAs[Boolean]("p95_rank_ok"), s"${r.getString(0)}: p95 flag false")
    }
  }

  test("HLL overlap: inclusion-exclusion estimate tracks the exact intersection") {
    import spark.implicits._
    // raw sketch gate — q253 now emits the contract as driver-oracle'd
    // booleans; this probes the numbers behind the flags
    val ev = Tables.events(spark, sf)
    def est(t: String) = ev.filter($"event_type" === t)
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14)))).head.getLong(0)
    val estA = est("click"); val estB = est("purchase")
    val estU = ev.filter($"event_type".isin("click", "purchase"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14)))).head.getLong(0)
    val exact = ev.filter($"event_type" === "click").select($"user_id").distinct()
      .join(ev.filter($"event_type" === "purchase").select($"user_id").distinct(),
        Seq("user_id"), "left_semi").count()
    assert(estU <= estA + estB, "union estimate cannot exceed the sum")
    assert(exact > 0, "fixture must have overlapping audiences")
    val estOv = estA + estB - estU
    val err = math.abs(estOv - exact.toDouble) / exact
    assert(err <= 0.05, s"overlap estimate $estOv vs exact $exact: error $err > 5%")
    // the entry's driver-facing flags are all true, and deterministic
    val r = Aggregates.q253HllOverlap.fn(spark, sf).head
    assert(r.getAs[Boolean]("overlap_within_5pct") && r.getAs[Boolean]("union_subadditive"))
    assert(Aggregates.q253HllOverlap.fn(spark, sf).head === r)
  }
}
