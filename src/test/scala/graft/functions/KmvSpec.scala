package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Laws for the KMV distinct-count sketch (q238). */
class KmvSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("KMV: exact below k, within 4-sigma above k, merge-order invariant") {
    import spark.implicits._
    val kmv = udaf(Aggregators.KmvSketch)

    // exactness floor: <= k distinct values => sketch returns the exact count
    val small = (1L to 200L).map(i => ("g", i)).toDF("g", "x")
      .select($"g", (xxhash64($"x") bitwiseXOR lit(Long.MinValue)).as("h"))
    val exactSmall = small.groupBy($"g").agg(kmv($"h")).head.getLong(1)
    assert(exactSmall === 200L, s"below-k estimate $exactSmall must be exact")

    // error law: 100k distinct >> k=256; KMV sigma = 1/sqrt(k-2) ~ 6.3%
    val big = (1L to 100000L).map(i => ("g", i)).toDF("g", "x")
      .repartition(16) // exercise the partial-merge path
      .select($"g", (xxhash64($"x") bitwiseXOR lit(Long.MinValue)).as("h"))
    val est = big.groupBy($"g").agg(kmv($"h")).head.getLong(1)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.25,
      s"KMV estimate $est off by more than 25% of 100000")

    // determinism: the sketch is a function of the value SET, so shuffling
    // the partitioning cannot change the estimate
    val est2 = (1L to 100000L).map(i => ("g", i)).toDF("g", "x")
      .repartition(3)
      .select($"g", (xxhash64($"x") bitwiseXOR lit(Long.MinValue)).as("h"))
      .groupBy($"g").agg(kmv($"h")).head.getLong(1)
    assert(est === est2, "estimate must be partitioning-invariant")

    // catalog entry: every priority group at smoke sf is below k => exact
    val byPrio = Aggregators.q238KmvDistinct.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_orderpriority").agg(countDistinct($"o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (p, d) =>
      if (d <= 256) assert(byPrio(p) === d, s"group $p below k must be exact")
      else assert(math.abs(byPrio(p) - d.toDouble) / d < 0.25)
    }
  }
}
