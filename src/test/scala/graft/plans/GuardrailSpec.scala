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
