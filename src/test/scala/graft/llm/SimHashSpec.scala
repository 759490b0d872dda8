package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the SimHash kernel and the banded pair join's scale guards:
  * the codegen'd graft_simhash64 Expression must be bit-identical to the
  * declarative HOF formulation it replaced, and hot-bucket sub-banding must
  * preserve the exact hamming<=3 pair set while splitting oversized band
  * buckets (SURVEY.md §2.10/§2.11). */
class SimHashSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("codegen graft_simhash64 is bit-identical to the HOF formulation") {
    import spark.implicits._
    val native = Dedup.simhashes(spark, sf).withColumnRenamed("simhash", "native")
    val hof = Dedup.simhashesHof(spark, sf).withColumnRenamed("simhash", "hof")
    val joined = native.join(hof, Seq("doc_id")).cache()
    try {
      assert(joined.count() > 0)
      val diff = joined.filter($"native" =!= $"hof").count()
      assert(diff === 0, "kernel and HOF signatures must agree on every document")
    } finally joined.unpersist()
  }

  test("codegen graft_simhash60_md5 matches the conv(md5) declarative formulation bit for bit") {
    import spark.implicits._
    // declarative twin of the kernel: one md5 per token hoisted into its own
    // column, then per-bit votes — the same construction the DuckDB oracle
    // runs (CAST('0x'||substr(md5(tok),1,15) AS BIGINT) bit votes), so this
    // gate is what licenses q105/q108's strict oracle.
    val hof = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("t"))
      .withColumn("hs", expr(
        "transform(t, tok -> cast(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("votes", expr(
        """aggregate(hs, array_repeat(0L, 60),
          |  (acc, h) -> zip_with(acc,
          |    transform(sequence(0, 59),
          |      i -> CASE WHEN (shiftright(h, i) & 1L) = 1L THEN 1L ELSE -1L END),
          |    (a, v) -> a + v))""".stripMargin))
      .withColumn("hof", expr(
        """aggregate(transform(sequence(0, 59),
          |  i -> CASE WHEN votes[i] > 0L THEN shiftleft(1L, i) ELSE 0L END),
          |  0L, (acc, b) -> acc | b)""".stripMargin))
      .select($"doc_id", $"hof")
    val native = Dedup.simhashes60(spark, sf).withColumnRenamed("simhash", "native")
    val joined = native.join(hof, Seq("doc_id")).cache()
    try {
      assert(joined.count() > 0)
      assert(joined.filter($"native" =!= $"hof").count() === 0L,
        "md5 kernel and conv(md5) formulation must agree on every document")
    } finally joined.unpersist()
  }

  test("hot band buckets sub-band: exact pair set preserved, oversized bucket split") {
    import spark.implicits._
    // 63 docs share the low 16-bit band value C0 (a template corpus in
    // miniature): with maxBucket=10 the (band=0, C0) bucket is hot and must
    // go through 12-bit sub-banding of the remaining 48 bits. Random high
    // bits keep most pairs far apart; planted neighbors at hamming 1/3 must
    // survive, the hamming-4 plant must not.
    val c0 = 0xBEEFL
    val rnd = new scala.util.Random(7)
    val base = (1L to 60L).map(i => i -> ((rnd.nextLong() & ~0xFFFFL) | c0))
    val planted = Seq(
      61L -> (base(0)._2 ^ (1L << 20)),                                  // hamming 1 vs doc 1
      62L -> (base(1)._2 ^ ((1L << 17) | (1L << 33) | (1L << 50))),      // hamming 3 vs doc 2
      63L -> (base(2)._2 ^ ((1L << 18) | (1L << 30) | (1L << 44) | (1L << 60)))) // hamming 4: excluded
    // cold docs: distinct band-0 values, one multi-band-agreeing pair
    // (70, 71 differ only in one bit of band 3 → bands 0..2 all agree —
    // exercises the first-matching-band dedup with no distinct()).
    val coldBase = (rnd.nextLong() & ~0xFFFFL) | 0x1234L
    val cold = Seq(70L -> coldBase, 71L -> (coldBase ^ (1L << 55)))
    val all = base ++ planted ++ cold
    val sigs = all.toDF("doc_id", "simhash")

    // brute-force truth over the fixture
    val truth = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(truth.contains((1L, 61L, 1)) && truth.contains((2L, 62L, 3)))
    assert(!truth.exists { case (a, b, _) => (a, b) == ((3L, 63L)) })
    assert(truth.contains((70L, 71L, 1)))

    // the fixture really does trip the hot-bucket guard
    val bucketMax = sigs.select(explode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b*16) & 65535L)")).as("v"))
      .groupBy($"v").count().agg(max($"count")).head.getLong(0)
    assert(bucketMax > 10, "fixture must contain an oversized band bucket")

    val got = Dedup.simhashPairs(sigs, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth,
      s"sub-banded join must equal all-pairs hamming<=3; diff ${(got -- truth) ++ (truth -- got)}")

    // and with the default (non-hot) path on the same fixture — same answer
    val gotCold = Dedup.simhashPairs(sigs, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotCold === truth)
  }
}
