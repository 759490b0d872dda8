package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for [[RewriteApproxDistinct]]: flag-off plan identity (the rule
  * must be invisible by default), sketched plan shape + ≤5% relative
  * error when opted in, and non-interference with sibling aggregates. */
class ApproxRewriteSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  private def toksBySource = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source")
      .agg(countDistinct($"tok").as("d"), count(lit(1)).as("n"))
  }

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteApproxDistinct
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("flag off: rule leaves the plan byte-identical") {
    withRule {
      spark.conf.unset(RewriteApproxDistinct.FlagKey)
      val q = toksBySource
      assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      assert(q.queryExecution.optimizedPlan.toString.contains("count(distinct") ||
        q.queryExecution.executedPlan.toString.contains("count(distinct"))
    }
  }

  test("flag on: distinct count runs as HLL++, estimate within 5%, siblings exact") {
    import spark.implicits._
    val exact = toksBySource.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    withRule {
      spark.conf.set(RewriteApproxDistinct.FlagKey, "true")
      try {
        val q = toksBySource
        assert(q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"),
          "opt-in flag must swap COUNT(DISTINCT) for the HLL++ sketch")
        q.collect().foreach { r =>
          val (ed, en) = exact(r.getString(0))
          assert(r.getLong(2) === en, "sibling count(*) must stay exact")
          val rel = math.abs(r.getLong(1) - ed).toDouble / ed
          assert(rel <= 0.05, s"HLL++ estimate off by ${rel * 100}% for ${r.getString(0)}")
        }
      } finally spark.conf.unset(RewriteApproxDistinct.FlagKey)
    }
  }

  test("q442 restores session state and emits per-source rows") {
    val before = spark.experimental.extraOptimizations
    val out = graft.operators.Aggregates.q442ApproxDistinctRewrite.fn(spark, sf)
    assert(out.count() > 0)
    assert(spark.experimental.extraOptimizations === before,
      "q442 must not leak the rewrite rule into the session")
    assert(spark.conf.getOption(RewriteApproxDistinct.FlagKey).isEmpty,
      "q442 must not leak the approx flag into the session")
  }
}
