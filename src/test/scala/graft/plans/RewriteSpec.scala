package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.sources.Tables

/** The optimizer rule must (a) fire on the HOF pattern, (b) preserve results
  * bit-for-bit, (c) leave non-matching HOFs untouched. */
class RewriteSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  test("HOF dot-product pattern is rewritten to graft_dot and results are identical") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(50)
    val pair = e.select($"vec_id", $"embedding".as("a"))
      .crossJoin(e.select($"embedding".as("b")))
    def hofDot = graft.llm.Similarity.dotHof($"a", $"b").as("d")

    val plain = pair.select(hofDot).collect().map(_.getDouble(0))
    val (optimizedPlanStr, rewritten) = withRule {
      val df = pair.select(hofDot)
      (df.queryExecution.optimizedPlan.toString, df.collect().map(_.getDouble(0)))
    }
    assert(optimizedPlanStr.contains("graft_dot"), s"rule did not fire:\n$optimizedPlanStr")
    assert(!optimizedPlanStr.contains("aggregate("), "HOF survived the rewrite")
    assert(plain.toSeq === rewritten.toSeq) // bit-exact
  }

  test("non-matching aggregates are left untouched") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(10)
    withRule {
      // sum (not product-of-pair) — must NOT be rewritten
      val df = e.select(aggregate(transform($"embedding", x => x.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.count() === 10)
    }
  }

  test("GraftExtensions installs without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // registration must not throw
  }
}
