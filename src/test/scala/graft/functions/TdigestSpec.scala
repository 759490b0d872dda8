package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the merging t-digest Aggregator: rank error of every emitted
  * quantile vs exact sorted data (the sketch's one contract), the
  * monotone p50 ≤ p95 ≤ p99 law, and determinism of the q448 census.
  * q448 itself now EMITS the rank contract as driver-oracle'd booleans
  * (the print-both form); this spec checks the raw numeric quantiles
  * directly so a silently-true flag can't hide a broken digest. */
class TdigestSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("raw digest quantiles land within 2% rank error of exact") {
    import spark.implicits._
    val exact = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val td = udaf(new Aggregators.TDigest(100))
    val out = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n"), td($"value").as("qs"))
      .select($"event_type", $"n",
        element_at($"qs", 1).as("p50"),
        element_at($"qs", 2).as("p95"),
        element_at($"qs", 3).as("p99"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getString(0)
      val xs = exact(et); val n = xs.length
      val qs = Seq(0.50 -> r.getAs[Double]("p50"),
        0.95 -> r.getAs[Double]("p95"), 0.99 -> r.getAs[Double]("p99"))
      qs.foreach { case (q, est) =>
        // rank of the estimate within the exact data
        val rank = xs.count(_ <= est).toDouble / n
        assert(math.abs(rank - q) <= 0.02 + 1.0 / n,
          s"$et p$q: estimate $est has rank $rank")
      }
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
      assert(r.getAs[Double]("p95") <= r.getAs[Double]("p99"))
      assert(r.getAs[Long]("n") === n.toLong)
    }
  }

  test("q448 census: every driver-facing contract flag is true") {
    val out = Aggregators.q448TdigestQuantiles.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      for (c <- Seq("p50_rank_ok", "p95_rank_ok", "p99_rank_ok", "monotone_ok"))
        assert(r.getAs[Boolean](c), s"${r.getString(0)}: $c is false")
    }
  }

  test("digest census is deterministic across two runs (merge-stable)") {
    val a = Aggregators.q448TdigestQuantiles.fn(spark, sf).collect().map(_.toString)
    val b = Aggregators.q448TdigestQuantiles.fn(spark, sf).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
