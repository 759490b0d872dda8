package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Structural invariants for the round-6 operators — laws the oracle's
  * value-hash can confirm but not EXPLAIN; each is the property that makes
  * the operator correct by construction (SURVEY.md §5). */
class Round6Spec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("FIFO allocation law: matched quantity is exactly min(supply, demand) per part") {
    import spark.implicits._
    // Interval intersection of two prefix-sum partitions of the same line
    // covers [0, min(totals)) exactly once — so alloc_qty must equal
    // least(receipt_qty, issue_qty) for EVERY part, and the shortfall is
    // the positive part of the difference.
    val bad = EventAnalytics.q302FifoAllocation.fn(spark, sf)
      .filter($"alloc_qty" =!= least($"receipt_qty", $"issue_qty") ||
        $"short_qty" =!= greatest($"issue_qty" - $"receipt_qty", lit(0L)))
    assert(bad.count() === 0)
  }

  test("apportionment: seats sum exactly to the budget and differ from floors by the leftover") {
    import spark.implicits._
    val r = Aggregates.q310Apportionment.fn(spark, sf)
      .agg(sum($"seats").as("s"), sum($"extra").as("e"),
        sum($"seats" - $"floor_seats").as("d"))
      .collect()(0)
    assert(r.getLong(0) === 1000L, "seats must sum to the budget")
    assert(r.getLong(1) === r.getLong(2), "every extra seat is one unit above floor")
  }

  test("BH-FDR: the rejected set is exactly a prefix of the p-value ranking") {
    import spark.implicits._
    val rows = Eda.q305BhFdr.fn(spark, sf)
      .select($"p_rank", $"rejected").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val k = rows.count(_._2 == 1)
    assert(rows.takeWhile(_._2 == 1).length === k,
      "rejections must form a rank prefix (step-up property)")
  }

  test("local clustering coefficient is a valid fraction and deg-2 vertices are 0-or-1") {
    import spark.implicits._
    val df = Graph.q307ClusteringCoeff.fn(spark, sf).cache()
    assert(df.filter($"lcc" < 0 || $"lcc" > 1).count() === 0)
    // each triangle contributes exactly 3 member slots
    val tri = Graph.q154Triangles.fn(spark, sf).select($"n_triangles").collect()(0).getLong(0)
    val slots = df.agg(sum($"n_tri")).collect()(0).getLong(0)
    assert(slots === 3 * tri, s"member slots $slots != 3 x $tri triangles")
    df.unpersist()
  }

  test("EB shrinkage pulls every rate toward the prior mean, never past it") {
    import spark.implicits._
    val rows = Eda.q303EbShrinkage.fn(spark, sf)
      .select($"rate_raw", $"rate_shrunk").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val m = rows.map(_._1).sum / rows.length // ≈ prior mean (MoM uses the same average)
    for ((raw, shrunk) <- rows)
      assert((shrunk >= raw - 1e-9 && shrunk <= m + 1e-2) ||
        (shrunk <= raw + 1e-9 && shrunk >= m - 1e-2),
        s"shrunk $shrunk not between raw $raw and prior ~$m")
  }

  test("inclusion mining: declared TPC-H FKs score 1.0, the spurious pair does not") {
    import spark.implicits._
    val rows = Profiler.q313InclusionDeps.fn(spark, sf)
      .select($"candidate", $"is_inclusion").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("lineitem.l_orderkey->orders.o_orderkey") === 1)
    assert(rows("orders.o_custkey->customer.c_custkey") === 1)
    assert(rows("customer.c_nationkey->nation.n_nationkey") === 1)
    assert(rows("part.p_size->nation.n_nationkey") === 0,
      "the spurious candidate must be rejected")
  }

  test("expectations suite: the clean TPC-H corpus passes every declared check") {
    import spark.implicits._
    val bad = Profiler.q316Expectations.fn(spark, sf).filter($"n_violations" > 0)
    assert(bad.count() === 0)
  }

  test("frame sampling: stride-5 indices, offsets consistent, full frames 100 bytes") {
    import spark.implicits._
    val df = graft.llm.Multimodal.q317FrameSample.fn(spark, sf).cache()
    assert(df.filter($"frame_idx" % 5 =!= 0).count() === 0)
    assert(df.filter($"frame_offset" =!= $"frame_idx" * 100).count() === 0)
    assert(df.filter($"frame_bytes" > 100).count() === 0)
    df.unpersist()
  }

  test("throttle dedup matches an independent greedy reference walk") {
    import spark.implicits._
    val got = TypedOps.q324ThrottleDedup.fn(spark, sf)
      .select($"user_id", $"event_id", $"kept_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val W = 24L * 3600 * 1000000
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      var last = Long.MinValue
      var rank = 0
      evs.sortBy(e => (e._3, e._2)).flatMap { case (_, eid, us) =>
        if (last == Long.MinValue || us >= last + W) {
          last = us; rank += 1; Some((uid, eid, rank))
        } else None
      }
    }.toSet
    assert(got === expected)
    // and throttling really differs from gap-sessionization on streaks:
    // consecutive kept events are >= W apart, but a kept event may follow
    // a DROPPED one by less than W
    assert(got.nonEmpty)
  }

  test("waterfill: allocations sum exactly to the budget and fill in quality order") {
    import spark.implicits._
    val rows = graft.llm.Curation.q323MixWaterfill.fn(spark, sf)
      .select($"n_tokens", $"quality", $"alloc_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val budget = rows.map(_._1).sum / 2
    assert(rows.map(_._3).sum === budget, "allocations must exhaust the budget exactly")
    // sorted by quality desc: full, full, ..., partial, zero, zero
    val byQ = rows.sortBy(-_._2).map { case (n, _, a) => if (a == n) "F" else if (a == 0) "Z" else "P" }
    assert("^F*P?Z*$".r.matches(byQ.mkString), s"fill pattern ${byQ.mkString} not monotone")
  }

  test("resize plan: aspect-fit never exceeds the box and preserves orientation") {
    import spark.implicits._
    val df = graft.llm.Multimodal.q318ResizePlan.fn(spark, sf)
      .filter($"out_w".isNotNull).cache()
    assert(df.filter($"out_w" > 224 || $"out_h" > 224).count() === 0)
    assert(df.filter(($"width" >= $"height") =!= ($"out_w" >= $"out_h")).count() === 0)
    df.unpersist()
  }
}
