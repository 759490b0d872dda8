package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution contracts (SURVEY §2.11 planner levers): the
  * two AQE behaviors a 100 TB deployment depends on must actually fire —
  * (1) post-shuffle partition COALESCING (32 configured shuffle partitions
  * collapse to few when the data is small — the "don't run 2000 empty
  * tasks" half of AQE), and (2) SKEW-JOIN SPLITTING (a hot key's oversized
  * shuffle partition is split into parallel sub-partitions instead of one
  * straggler task — the "one task runs for 3 hours" half). Both are
  * asserted on the EXECUTED plan (AQE re-plans at runtime; the pre-execution
  * plan cannot show either), and both runs are checked for result equality
  * against an AQE-off run — the optimization must never change answers. */
class AqeSpec extends AnyFunSuite with graft.SparkFixture {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces post-shuffle partitions for a small aggregation") {
    import spark.implicits._
    val agg = () => graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val expected = withConf("spark.sql.adaptive.enabled" -> "false") {
      agg().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true") {
      val df = agg()
      val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows === expected, "AQE changed the aggregation result")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"expected a coalesced AQEShuffleRead in the executed plan:\n$plan")
      val parts = df.rdd.getNumPartitions
      assert(parts < 32,
        s"AQE left $parts post-shuffle partitions for a ${rows.size}-group agg")
    }
  }

  test("AQE splits a skewed join partition instead of leaving a straggler") {
    import spark.implicits._
    // Deterministic skew: 97% of 120k fact rows share key 0; dim has 64 keys.
    val fact = spark.range(0, 120000)
      .select(when($"id" % 32 === 0, $"id" % 64).otherwise(lit(0L)).as("k"),
        ($"id" * 37 % 1000).as("v"),
        // widen rows so the hot partition crosses the byte threshold
        concat_ws("-", Seq.fill(8)(md5($"id".cast("string"))): _*).as("pad"))
    val dim = spark.range(0, 64).select($"id".as("k"), ($"id" * 11).as("w"))
    val join = () => fact.join(dim, "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
    val expected = withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      join().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = join()
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === expected, "skew-join split changed the join result")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew="), s"no skew marker in executed plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition (join shows skew=false):\n$plan")
    }
  }
}
