package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gate for q108 multi-probe banding (SURVEY.md §2.10): probing each 16-bit
  * band's 16 one-bit flips must recover EXACTLY the hamming≤7 pair set
  * (pigeonhole: ≤7 bits over 4 bands ⇒ some band differs in ≤1), emit each
  * pair once (no distinct() anywhere in the plan), and the radius dial must
  * clip without losing closer pairs. */
class MultiprobeSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  private def fixture: (Seq[(Long, Long)], Seq[(Long, Long, Int)]) = {
    val rnd = new scala.util.Random(13)
    val base = (1L to 40L).map(i => i -> rnd.nextLong())
    def flip(sig: Long, bits: Long*) = bits.foldLeft(sig)((s, b) => s ^ (1L << b))
    val planted = Seq(
      41L -> flip(base(0)._2, 20),                          // hamming 1 vs doc 1
      42L -> flip(base(1)._2, 3, 19, 35, 51),               // hamming 4 vs doc 2 (1 bit/band)
      43L -> flip(base(2)._2, 5, 6, 21, 37, 38, 53, 60),    // hamming 7 vs doc 3
      44L -> flip(base(3)._2, 1, 2, 17, 18, 33, 34, 49, 50)) // hamming 8: excluded
    val all = base ++ planted
    val truth = for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (a, b, h)
    (all, truth)
  }

  test("multi-probe banding returns exactly the hamming<=7 pair set, each pair once") {
    import spark.implicits._
    val (all, truth) = fixture
    assert(truth.exists(_._3 == 4) && truth.exists(_._3 == 7),
      "fixture must plant radius-4+ pairs beyond q105's reach")
    val rows = Dedup.simhashPairsMultiprobe(all.toDF("doc_id", "simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows.size === rows.distinct.size,
      "a pair was emitted twice — first-agreeing-band dedup broken")
    assert(rows.toSet === truth.toSet,
      s"diff ${(rows.toSet -- truth.toSet) ++ (truth.toSet -- rows.toSet)}")
  }

  test("hot band buckets sub-band at radius 7: exact pair set preserved") {
    import spark.implicits._
    // 60 docs share the low 16-bit band value (template corpus): with
    // maxBucket=10 the (band=0, C0) bucket is hot AND every probe of a
    // nearby band-0 value lands in it — the radius-7 sub-banding (8 × 6-bit
    // cells of the remaining 48 bits) must split it without losing pairs.
    val c0 = 0xFACEL
    val rnd = new scala.util.Random(17)
    def flip(sig: Long, bits: Long*) = bits.foldLeft(sig)((s, b) => s ^ (1L << b))
    val base = (1L to 60L).map(i => i -> ((rnd.nextLong() & ~0xFFFFL) | c0))
    val planted = Seq(
      61L -> flip(base(0)._2, 20, 33, 47, 50),                 // hamming 4 vs doc 1
      62L -> flip(base(1)._2, 2, 18, 19, 35, 36, 52, 60),      // hamming 7 vs doc 2 (band0 ham 1)
      63L -> flip(base(2)._2, 1, 2, 17, 18, 33, 34, 49, 50)) // hamming 8: every band ham 2 → excluded
    val all = base ++ planted
    val truth = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (a, b, h)).toSet
    assert(truth.contains((1L, 61L, 4)) && truth.contains((2L, 62L, 7)))
    assert(!truth.exists { case (a, b, _) => (a, b) == ((3L, 63L)) })

    val sigs = all.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairsMultiprobe(sigs, radius = 7, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.size === got.distinct.size, "duplicate pair emitted on the hot path")
    assert(got.toSet === truth,
      s"diff ${(got.toSet -- truth) ++ (truth -- got.toSet)}")
    // and the unguarded path agrees on the same fixture
    val gotCold = Dedup.simhashPairsMultiprobe(sigs, radius = 7, maxBucket = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotCold === truth)
  }

  test("radius dial clips at the requested hamming without losing closer pairs") {
    import spark.implicits._
    val (all, truth) = fixture
    val got4 = Dedup.simhashPairsMultiprobe(all.toDF("doc_id", "simhash"), radius = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got4 === truth.filter(_._3 <= 4).toSet)
    assertThrows[IllegalArgumentException] {
      Dedup.simhashPairsMultiprobe(all.toDF("doc_id", "simhash"), radius = 8)
    }
  }
}
