package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Domain-law gates for the round-9 additions (q507–q510) and the round-9
  * strict conversions (q439 quantization, BPE whole-symbol guard) beyond
  * their oracles. */
class Round13Spec extends AnyFunSuite with graft.SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q507 DSIR weights match an independent in-memory reference") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent reference: same bigram/bucket/smoothing/quantization walk
    def buckets(text: String): Seq[Long] = {
      val t = text.split(" ").filter(_.nonEmpty)
      t.sliding(2).filter(_.length == 2).map { bg =>
        java.lang.Long.parseLong(md5hex(bg.mkString(" ")).take(4), 16) % 128L
      }.toSeq
    }
    val perDoc = docs.map { case (id, src, tx) =>
      (id, src, id % 50 == 0, buckets(tx).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val ct = Array.fill(128)(0L); val cr = Array.fill(128)(0L)
    perDoc.foreach { case (_, _, tgt, m) =>
      m.foreach { case (b, n) => if (tgt) ct(b.toInt) += n else cr(b.toInt) += n } }
    val (tTot, rTot) = (ct.sum, cr.sum)
    val qlr = Array.tabulate(128) { b =>
      math.floor(1e6 * math.log(
        ((ct(b) + 1.0) * (rTot + 128.0)) / ((cr(b) + 1.0) * (tTot + 128.0)))).toLong
    }
    val refTop = perDoc.filter(d => !d._3 && d._4.nonEmpty)
      .map { case (id, src, _, m) =>
        (id, src, m.values.sum, m.map { case (b, n) => n * qlr(b.toInt) }.sum)
      }
      .sortBy { case (id, _, _, w) => (-w, id) }.take(100)
    val got = graft.llm.Curation.q507DsirImportance.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === refTop.toSeq)
    assert(got.forall(_._1 % 50 != 0), "a target (eval-holdout) doc leaked into the selection")
  }

  test("q508 calibration: est16 domain, pair-census total equals q499's, mean bracketed") {
    import spark.implicits._
    val rows = graft.llm.Dedup.q508MinhashCalibration.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val est = r.getLong(0)
      assert(est >= 0 && est <= 16)
      assert(r.getLong(1) === est * 62500)
      assert(r.getLong(3) >= r.getLong(4) && r.getLong(3) <= r.getLong(5),
        s"mean outside [min, max] at est16=$est")
    }
    val totalPairs = rows.map(_.getLong(2)).sum
    val q499Total = graft.llm.Dedup.q499JaccardHistogram.fn(spark, sf)
      .agg(sum($"n_pairs")).head.getLong(0)
    assert(totalPairs === q499Total,
      "calibration must cover exactly the co-shingle pair census")
    // Broder's identity, order form: the highest-agreement bucket's mean
    // exact Jaccard must be >= the lowest's (vacuous only if one bucket).
    if (rows.length > 1)
      assert(rows.maxBy(_.getLong(0)).getLong(3) >= rows.minBy(_.getLong(0)).getLong(3))
  }

  test("q509 snake sharding: partition of the corpus with item-bounded imbalance") {
    import spark.implicits._
    val rows = graft.llm.Curation.q509SnakeSharding.fn(spark, sf).collect()
    val d = graft.sources.Tables.documents(spark, sf)
      .select(size(filter(split($"text", " "), x => x =!= "")).cast("long").as("t"))
    val (nDocs, tokTot, tokMax) =
      (d.count(), d.agg(sum($"t")).head.getLong(0), d.agg(max($"t")).head.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (0L until 16L), "all 16 shards present, ordered")
    assert(rows.map(_.getLong(1)).sum === nDocs)
    assert(rows.map(_.getLong(2)).sum === tokTot)
    val loads = rows.map(_.getLong(2))
    assert(loads.max - loads.min <= 2 * tokMax,
      s"snake imbalance ${loads.max - loads.min} exceeds the 2x-max-item bound ($tokMax)")
  }

  test("q510 quantization dedup: census algebra, zero dups on the live corpus") {
    import spark.implicits._
    val rows = graft.llm.Similarity.q510EmbeddingQuantDedup.fn(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === n)
    for (r <- rows) {
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2), "n_dups != n_vectors - n_buckets")
      assert(r.getLong(4) >= 1)
    }
    // the live synthetic cloud has no duplicate vectors — quantization must
    // not invent any (the sf1 replica tier is where dups appear by design)
    assert(rows.map(_.getLong(3)).sum === 0, "quantization collided distinct vectors")
  }

  test("q439 quantized Viterbi: corpus segmentation matches an integer-cost reference DP") {
    import spark.implicits._
    // rebuild the quantized vocab exactly as q439 does, then replay the DP
    // in plain Scala with Long costs and compare the usage census
    val tok = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("t")).filter($"t" =!= "")
    val wc = tok.groupBy($"t".as("w")).agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tot = wc.map(_._2).sum
    val subs = scala.collection.mutable.Map[String, Long]()
    for ((w, n) <- wc; d <- 1 to 4; i <- 0 to w.length - d)
      subs(w.substring(i, i + d)) = subs.getOrElse(w.substring(i, i + d), 0L) + n
    val vocab = subs.filter { case (s, f) => s.length == 1 || f >= tot / 50 }.toMap
    val ftot = vocab.values.sum.toDouble
    val cost = vocab.map { case (s, f) =>
      s -> math.floor(-math.log(f / ftot) * 1048576.0).toLong }
    val usage = scala.collection.mutable.Map[String, Long]()
    for ((w, n) <- wc) {
      val best = Array.fill(w.length + 1)((Long.MaxValue, 0))
      best(0) = (0L, 0)
      for (i <- 1 to w.length; d <- 1 to math.min(4, i))
        cost.get(w.substring(i - d, i)).foreach { c =>
          val cand = (best(i - d)._1 + c, d)
          if (cand._1 < best(i)._1 || (cand._1 == best(i)._1 && d < best(i)._2))
            best(i) = cand
        }
      var pos = w.length
      while (pos > 0) {
        val d = best(pos)._2
        val piece = w.substring(pos - d, pos)
        usage(piece) = usage.getOrElse(piece, 0L) + n
        pos -= d
      }
    }
    val uTot = usage.values.sum
    val refTop = usage.toSeq.map { case (p, u) =>
      (p, p.length.toLong, u, 1000000L * u / uTot) }
      .sortBy { case (p, _, u, _) => (-u, p) }.take(50)
    val got = graft.llm.TextAnalysis.q439UnigramLmRound.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === refTop)
  }
}
