package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CartesianGuardrail policy rule: blocks unbounded cartesian products at
  * optimization time, allows bounded (scalar-broadcast) ones and the
  * explicit session override. Runs on a DEDICATED session (newSession +
  * experimental methods) so the shared fixture session — whose catalog
  * legitimately cross-joins — is untouched. */
class GuardrailSpec extends AnyFunSuite with graft.SparkFixture {

  private def guarded: SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(CartesianGuardrail)
    s
  }

  test("unbounded x unbounded cartesian product is rejected") {
    val s = guarded
    import s.implicits._
    val big1 = s.range(10000).toDF("a")
    val big2 = s.range(10000).toDF("b")
    val e = intercept[Exception] {
      big1.crossJoin(big2).count()
    }
    assert(e.getMessage.contains("graft guardrail"), e.getMessage)
  }

  test("ON true and one-sided conditions are rejected like condition-less joins") {
    val s = guarded
    import s.implicits._
    val big1 = s.range(10000).toDF("a")
    val big2 = s.range(10000).toDF("b")
    val litTrue = intercept[Exception] {
      big1.join(big2, org.apache.spark.sql.functions.lit(true), "inner").count()
    }
    assert(litTrue.getMessage.contains("graft guardrail"), litTrue.getMessage)
    val oneSided = intercept[Exception] {
      big1.join(big2, $"a" > 5, "inner").count() // references left side only
    }
    assert(oneSided.getMessage.contains("graft guardrail"), oneSided.getMessage)
  }

  test("a genuine two-sided non-equi condition is NOT a guardrail matter") {
    val s = guarded
    import s.implicits._
    val a = s.range(100).toDF("a")
    val b = s.range(100).toDF("b")
    // range joins plan as BNLJ — slow, but conditioned; policy lets them by
    assert(a.join(b, $"a" === $"b" + 1, "inner").count() === 99L)
  }

  test("scalar-broadcast cross join (bounded side) passes") {
    val s = guarded
    import s.implicits._
    import org.apache.spark.sql.functions._
    val big = s.range(10000).toDF("a")
    val scalarAgg = big.agg(sum($"a").as("tot")) // maxRows = 1
    assert(big.crossJoin(scalarAgg).count() === 10000L)
  }

  test("the session override re-admits the cartesian product") {
    val s = guarded
    import s.implicits._
    s.conf.set("spark.graft.allowCartesian", "true")
    val a = s.range(2000).toDF("a")
    val b = s.range(2000).toDF("b")
    assert(a.crossJoin(b).count() === 4000000L)
  }
}
