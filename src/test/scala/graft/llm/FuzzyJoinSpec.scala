package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the Fellegi–Sunter EM estimator (q348): parameter recovery on
  * an exact-expectation fixture with planted (p, m, u), and structural
  * agreement with q282's pinned-parameter scoring over the same blocked
  * candidate pairs. */
class FuzzyJoinSpec extends AnyFunSuite with SparkFixture {

  test("EM recovers planted (p, m, u) from an exact-expectation census") {
    val pTrue = 0.3
    val mTrue = Array(0.95, 0.90, 0.80)
    val uTrue = Array(0.20, 0.30, 0.25)
    val n = 100000.0
    // exact-expectation census: cell mass = N * (p·Πm-terms + (1-p)·Πu-terms)
    val census =
      for (g1 <- Seq(0, 1); g2 <- Seq(0, 1); g3 <- Seq(0, 1)) yield {
        val g = Array(g1, g2, g3)
        def prod(ps: Array[Double]) =
          g.zip(ps).map { case (gi, pi) => if (gi == 1) pi else 1.0 - pi }.product
        (g, n * (pTrue * prod(mTrue) + (1.0 - pTrue) * prod(uTrue)))
      }
    var p = 0.1
    var m = Array(0.9, 0.9, 0.9)
    var u = Array(0.35, 0.35, 0.35)
    for (_ <- 1 to 300) {
      val (p2, m2, u2) = FuzzyJoin.fsEmRound(census, p, m, u)
      p = p2; m = m2; u = u2
    }
    assert(math.abs(p - pTrue) < 0.02, s"prior: $p vs $pTrue")
    for (j <- 0 until 3) {
      assert(math.abs(m(j) - mTrue(j)) < 0.02, s"m($j): ${m(j)} vs ${mTrue(j)}")
      assert(math.abs(u(j) - uTrue(j)) < 0.02, s"u($j): ${u(j)} vs ${uTrue(j)}")
    }
  }

  test("EM round preserves probability ranges and total mass semantics") {
    val census = Seq(
      (Array(1, 1, 1), 50.0), (Array(0, 0, 0), 900.0), (Array(1, 0, 0), 30.0))
    val (p, m, u) = FuzzyJoin.fsEmRound(census, 0.1,
      Array(0.9, 0.9, 0.9), Array(0.1, 0.1, 0.1))
    assert(p > 0 && p < 1)
    (m ++ u).foreach(x => assert(x > 0 && x < 1))
  }

  test("q348 scores the same blocked candidate pairs as q282, all finite") {
    val em = FuzzyJoin.q348FellegiSunterEm.fn(spark, sf).collect()
    val pinned = FuzzyJoin.q282FellegiSunter.fn(spark, sf).collect()
    assert(em.nonEmpty)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(r.fieldIndex("ka")), r.getLong(r.fieldIndex("kb")))).toSet
    assert(pairs(em) === pairs(pinned),
      "EM variant must score exactly the blocked candidate set")
    // scores are integer ten-thousandths since r10 (the q491/q244 fence);
    // non-finiteness would have thrown in the floor→long cast already
    val byAgree = em.groupBy(r => (r.getInt(r.fieldIndex("agree_nation")),
      r.getInt(r.fieldIndex("agree_segment")), r.getInt(r.fieldIndex("agree_balance"))))
    for (full <- byAgree.get((1, 1, 1)); none <- byAgree.get((0, 0, 0))) {
      val minFull = full.map(_.getLong(full.head.fieldIndex("fs_score_e4"))).min
      val maxNone = none.map(_.getLong(none.head.fieldIndex("fs_score_e4"))).max
      assert(minFull > maxNone, "EM weights must order agreement above disagreement")
    }
  }
}
