package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the custom whole-operator (logical node + strategy +
  * physical exec): result equivalence with the window formulation on a
  * multi-partition skewed fixture, small-group semantics (groups with
  * fewer than k rows keep all rows), and the plan contract (heap exec
  * present, no sort, one shuffle). */
class TopKPerGroupSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("TopKPerGroupExec equals the window top-k on a skewed fixture; small groups survive whole") {
    import spark.implicits._
    // group 1: 100 rows (skew), group 2: 5, group 3: 2 (< k), group 4: 1
    val rows =
      (1 to 100).map(i => (1L, i.toLong, i * 1.5)) ++
        (1 to 5).map(i => (2L, 200L + i, 10.0 - i)) ++
        Seq((3L, 301L, 7.0), (3L, 302L, 9.0), (4L, 401L, 1.0))
    val df = rows.toDF("g", "id", "v").repartition(7) // scatter across partitions
    val top = TopKPerGroup.topK(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)
    val got = top.select($"g", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val expected = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.count(_._1 == 3L) === 2, "a 2-row group keeps both rows")
    assert(got.count(_._1 == 4L) === 1, "a 1-row group keeps its row")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Sort"), "heap must replace the sort entirely")
  }

  test("duplicate sort values break ties on the unique column deterministically") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0))
      .toDF("g", "id", "v").repartition(3)
    val got = TopKPerGroup.topK(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 11L), "equal v => lowest ids win via the asc tie-break")
  }
}
