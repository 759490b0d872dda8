package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native broadcast as-of operator must agree ROW-FOR-ROW with q20's
  * relational union+window formulation (they share the oracle), and honor
  * the no-match (null right) and tie (greatest orderkey at equal time)
  * rules on a hand-built fixture. */
class AsofBroadcastJoinSpec extends AnyFunSuite with graft.SparkFixture {

  test("native as-of == q20 union+window formulation on the full corpus") {
    val native = graft.operators.Joins.q388AsofNative.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val relational = graft.operators.Joins.q20AsofJoin.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native === relational,
      s"native-only=${(native -- relational).take(5)}, " +
        s"window-only=${(relational -- native).take(5)}")
  }

  test("fixture: no-match rows null out, equal-time ties pick the greatest tiebreak") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // after both refs for key 10 → latest (t=90) wins
      (2L, 10L, 50L),  // between → t=40 row
      (3L, 10L, 5L),   // before any ref → null
      (4L, 20L, 40L),  // key 20: two refs at the SAME time 40 → greater tie wins
      (5L, 30L, 40L)   // key with no refs at all → null
    ).toDF("event_id", "k", "t")
    val ref = Seq(
      (10L, 40L, 1L), (10L, 90L, 2L),
      (20L, 40L, 7L), (20L, 40L, 9L)
    ).toDF("rk", "rt", "tie")
    val out = AsofBroadcastJoin.asof(probe, ref, "k", "t", "rk", "rt", "tie")
      .select($"event_id", $"tie")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(2L), 2L -> Some(1L), 3L -> None,
      4L -> Some(9L), 5L -> None))
  }

  test("API guards: key-type mismatch and non-long-backed time fail loudly") {
    import spark.implicits._
    val probe = Seq((1L, 10L, 100L)).toDF("event_id", "k", "t")
    // int key vs the probe's long key — would silently null-enrich via
    // UnsafeRow byte mismatch without the guard (ADVICE r5)
    val refIntKey = Seq((10, 40L, 1L)).toDF("rk", "rt", "tie")
    val e1 = intercept[IllegalArgumentException](
      AsofBroadcastJoin.asof(probe, refIntKey, "k", "t", "rk", "rt", "tie"))
    assert(e1.getMessage.contains("key type mismatch"))
    // string time column — would NPE/ClassCastException inside the exec
    val refStrTime = Seq((10L, "x", 1L)).toDF("rk", "rt", "tie")
    val e2 = intercept[IllegalArgumentException](
      AsofBroadcastJoin.asof(probe, refStrTime, "k", "t", "rk", "rt", "tie"))
    assert(e2.getMessage.contains("must be timestamp/long/int"))
  }

  test("null times: null-time reference rows are skipped, null-time probes null-enrich") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, Some(100L)), // normal probe: only the non-null-time ref qualifies
      (2L, 10L, None)        // null-time probe: no ref can satisfy <= NULL
    ).toDF("event_id", "k", "t")
    val ref = Seq(
      (10L, Some(40L), 1L),
      (10L, None, 2L) // null-time ref: can never win deterministically
    ).toDF("rk", "rt", "tie")
    val out = AsofBroadcastJoin.asof(probe, ref, "k", "t", "rk", "rt", "tie")
      .select($"event_id", $"tie")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(1L), 2L -> None))
  }

  test("empty reference: every probe row survives with null right side") {
    import spark.implicits._
    val probe = Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("event_id", "k", "t")
    val ref = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "tie")
    val out = AsofBroadcastJoin.asof(probe, ref, "k", "t", "rk", "rt", "tie")
      .collect()
    assert(out.length === 2)
    assert(out.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)),
      "right-side columns must be null under an empty reference")
  }

  test("build side is collected and indexed ONCE across two actions on the same plan") {
    import spark.implicits._
    val probe = (1L to 50L).map(i => (i, i % 3, i)).toDF("event_id", "k", "t")
    val ref = Seq((0L, 10L, 1L), (1L, 20L, 2L), (2L, 30L, 3L)).toDF("rk", "rt", "tie")
    val out = AsofBroadcastJoin.asof(probe, ref, "k", "t", "rk", "rt", "tie")
    val before = AsofBroadcastJoinExec.buildCount.get()
    // Two ACTIONS on the SAME plan: collect() reuses the DataFrame's cached
    // executedPlan, so both runs hit the same exec node — the memoized
    // build must fire once. (count() would re-PLAN into a fresh aggregate
    // tree each call, which is a different plan, not a reused one.)
    assert(out.collect().length === 50)  // action #1 builds + broadcasts
    assert(out.collect().length === 50)  // action #2 must REUSE the build
    val builds = AsofBroadcastJoinExec.buildCount.get() - before
    assert(builds === 1L,
      s"expected one build-side collect across two actions, saw $builds")
  }
}
