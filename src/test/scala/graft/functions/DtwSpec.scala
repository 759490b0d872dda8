package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import org.apache.spark.sql.catalyst.util.ArrayData

/** Gates for the `graft_dtw` Expression (codegen kernel #10): independent
  * full-matrix banded DP, metric-ish laws (identity, symmetry, diagonal
  * upper bound), band semantics, and codegen parity via the q443 query. */
class DtwSpec extends AnyFunSuite with SparkFixture {

  /** Independent reference: full (m+1)×(n+1) matrix, no rolling rows. */
  private def refDtw(a: Array[Long], b: Array[Long], w: Int): Long = {
    val inf = Long.MaxValue / 4
    if (a.isEmpty || b.isEmpty) return if (a.length == b.length) 0L else inf
    val dp = Array.fill(a.length + 1, b.length + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length if math.abs(i - j) <= w) {
      val best = Seq(dp(i - 1)(j - 1), dp(i - 1)(j), dp(i)(j - 1)).min
      if (best < inf) dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) + best
    }
    dp(a.length)(b.length)
  }

  private def run(a: Array[Long], b: Array[Long], w: Int): Long =
    DtwDistance.dtw(ArrayData.toArrayData(a), ArrayData.toArrayData(b), w)

  test("fixture truths and laws") {
    val a = Array(1L, 5L, 9L, 5L, 1L)
    val shifted = Array(5L, 9L, 5L, 1L, 1L) // same shape, one step early
    assert(run(a, a, 3) === 0L)
    assert(run(a, shifted, 3) === run(shifted, a, 3), "symmetry")
    // elastic matching beats pointwise alignment on the phase-shifted pair
    val l1 = a.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    assert(run(a, shifted, 3) < l1)
    // equal lengths: diagonal path is in-band, so dtw <= pointwise L1
    assert(run(a, shifted, 1) <= l1)
    // band too narrow for the length gap => unreachable
    assert(run(a, Array(1L), 2) === Long.MaxValue / 4)
    assert(run(Array.empty[Long], Array.empty[Long], 2) === 0L)
  }

  test("rolling-row kernel equals the independent full-matrix DP") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val m = 1 + rnd.nextInt(20); val n = math.max(1, m + rnd.nextInt(7) - 3)
      val w = 3 + rnd.nextInt(5)
      val a = Array.fill(m)(rnd.nextInt(1000).toLong)
      val b = Array.fill(n)(rnd.nextInt(1000).toLong)
      assert(run(a, b, w) === refDtw(a, b, w), s"m=$m n=$n w=$w")
    }
  }

  test("q443 emits the 10-pair matrix deterministically (codegen path)") {
    val out1 = graft.operators.Eda.q443DtwMatrix.fn(spark, sf).collect()
    val out2 = graft.operators.Eda.q443DtwMatrix.fn(spark, sf).collect()
    assert(out1.length === 10)
    assert(out1.map(_.toString).toSeq === out2.map(_.toString).toSeq)
    out1.foreach(r => assert(r.getAs[Long]("dtw_cents") >= 0L))
  }
}
