package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the connected-components pair (SURVEY.md §2.10 dedup
  * clustering): large-star/small-star must label adversarial high-diameter
  * graphs correctly in O(log n) rounds, agree with min-label propagation
  * where both converge, and min-label propagation must now fail LOUDLY
  * (not silently wrong) past its diameter cap. */
class StarComponentsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star components: 64-node path graph labels in O(log n) rounds") {
    import spark.implicits._
    val verts = (1L to 64L).toDF("id")
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.starComponents(verts, chain)
    val got = labelsOf(labels)
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
    // diameter 63 would cost min-label 63 rounds; the alternation is
    // logarithmic: ceil(log2 64) = 6, allow slack for the final no-op check
    assert(rounds <= 10, s"path graph took $rounds rounds — not O(log n)")
  }

  test("star components agree with min-label propagation on a mixed random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 200L
    val verts = (1L to n).toDF("id")
    // random sparse edges + a few planted cliques + isolated vertices
    val edges = (Seq.fill(120)((rnd.nextLong(n) + 1, rnd.nextLong(n) + 1)) ++
      (for (base <- Seq(10L, 50L); i <- 0L to 3L; j <- (i + 1) to 4L)
        yield (base + i, base + j)))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("a", "b")
    val star = labelsOf(Dedup.starComponents(verts, pairs)._1)
    val prop = labelsOf(Dedup.minLabelComponents(verts, pairs))
    assert(star === prop)
    assert(star.size === n)
  }

  test("q109 (star) equals q100 (propagation) on the documents corpus") {
    val a = Dedup.q100DedupClusters.fn(spark, sf).collect().map(_.toSeq).toSeq
    val b = Dedup.q109DedupClustersStar.fn(spark, sf).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("min-label propagation fails loudly past the diameter cap; star handles the same chain") {
    import spark.implicits._
    val verts = (1L to 30L).toDF("id")
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    // diameter 29 > the 25-round cap → must throw, never return silently-wrong labels
    val e = intercept[IllegalArgumentException] {
      Dedup.minLabelComponents(verts, chain).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    val (labels, _) = Dedup.starComponents(verts, chain)
    assert(labelsOf(labels) === (1L to 30L).map(_ -> 1L).toMap)
  }
}
