package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Domain-law gates for the round-12 additions (q485–q493) beyond their
  * strict oracles: each entry's defining algebraic property asserted on
  * the smoke tier. */
class Round12Spec extends AnyFunSuite with graft.SparkFixture {

  test("q485 gopher rules: verdict is the rule conjunction and every rule discriminates") {
    import spark.implicits._
    val rows = graft.llm.TextAnalysis.q485GopherRules.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val Seq(wc, ml, rep, st, pass) = (5 to 9).map(r.getBoolean)
      assert(pass === (wc && ml && rep && st), s"verdict != conjunction at doc ${r.getLong(0)}")
    }
    // a filter whose rules never fire is a no-op pretending to be a gate —
    // at least two rule families must reject something on the smoke corpus
    val rejecting = (5 to 8).count(i => rows.exists(r => !r.getBoolean(i)))
    assert(rejecting >= 2, s"only $rejecting rule families discriminate")
    assert(rows.exists(_.getBoolean(9)) && rows.exists(!_.getBoolean(9)),
      "pass verdict must split the corpus")
  }

  test("q486 png header: parsed fields round-trip the synthesized dimensions, 29-byte header") {
    import spark.implicits._
    val bad = graft.llm.Multimodal.q486PngHeaderParse.fn(spark, sf)
      .filter($"width" =!= lit(16) + $"doc_id" % 640 ||
        $"height" =!= lit(16) + ($"doc_id" * 7) % 480 ||
        $"bit_depth" =!= 8 ||
        length($"payload_hex") =!= 58 ||
        !substring($"payload_hex", 1, 16).equalTo("89504E470D0A1A0A"))
    assert(bad.count() === 0)
  }

  test("q487 average precision matches an in-memory reference on the ranked corpus") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars", ($"lang" === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val ranked = docs.sortBy { case (id, n, _) => (-n, id) }
    var hits = 0L
    var apAcc = 0L
    var np = 0L
    val pAt = scala.collection.mutable.Map[Long, Long]()
    for (((_, _, pos), i) <- ranked.zipWithIndex) {
      val rk = i + 1L
      if (pos) { hits += 1; np += 1; apAcc += 1000000000000L * hits / rk }
      if (Seq(5L, 10L, 20L, 50L).contains(rk)) pAt(rk) = 1000000L * hits / rk
    }
    val expected = pAt.toMap.map { case (k, p) => k -> (p, np, apAcc / np) }
    val got = graft.llm.Search.q487AveragePrecision.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("q488 runtime bloom join: filter injected, session confs restored, result = plain join") {
    import spark.implicits._
    val before = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => spark.conf.getOption(k))
    val df = graft.operators.Joins.q488RuntimeBloomJoin.fn(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("might_contain"))
    val after = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => spark.conf.getOption(k))
    assert(before === after, "q488 must restore session confs")
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloomed === plain, "bloom filtering must not change the join result")
  }

  test("q489 pii redaction: redacted text is clean and counts match the planted arms") {
    import spark.implicits._
    val out = graft.operators.Governance.q489PiiRedaction.fn(spark, sf).cache()
    try {
      assert(out.filter($"redacted".rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).count() === 0,
        "emails must be gone after redaction")
      assert(out.filter($"redacted".rlike("\\+[0-9]{10,14}")).count() === 0,
        "phones must be gone after redaction")
      val bad = out.filter(
        $"n_emails" =!= when($"doc_id" % 3 === 0, 1L).otherwise(0L) ||
          $"n_phones" =!= when($"doc_id" % 4 === 0, 1L).otherwise(0L))
      assert(bad.count() === 0, "counts must match the planted arms exactly")
      assert(out.filter($"redacted".contains("<EMAIL>")).count() > 0)
      assert(out.filter($"redacted".contains("<PHONE>")).count() > 0)
    } finally out.unpersist()
  }

  test("q490 nelson-aalen brackets kaplan-meier: exp(-H) >= S_KM at every t") {
    import spark.implicits._
    val na = graft.operators.EventAnalytics.q490NelsonAalen.fn(spark, sf)
      .select($"t", $"breslow_survival").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val km = graft.operators.EventAnalytics.q180KaplanMeier.fn(spark, sf)
      .select($"t", $"survival").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(na.keySet === km.keySet)
    for ((t, s) <- km)
      assert(na(t) >= s - 1e-9, s"exp(-H)=${na(t)} < S_KM=$s at t=$t")
  }

  test("q491 dp quantile: release is census-valued and concentrates near the true quantile") {
    import spark.implicits._
    val rows = graft.operators.Governance.q491DpQuantileEm.fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(25L, 50L, 75L))
    val n = rows.head.getLong(3)
    for (r <- rows)
      assert(r.getLong(2) <= n / 10,
        s"rank error ${r.getLong(2)} too large for n=$n at q=${r.getLong(0)}")
  }

  test("q492 group k-fold: folds partition the orders and no group leaks") {
    import spark.implicits._
    val rows = graft.operators.Eda.q492GroupKfold.fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 4L))
    assert(rows.map(_.getLong(5)).forall(_ === 0L), "cross-fold leaky groups must be zero")
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "folds must partition, not sample")
  }

  test("q494 portable minhash: 16 hashes per signed-up doc, min law on a hand fixture") {
    import spark.implicits._
    val sig = graft.llm.Dedup.q494MinhashPortable.fn(spark, sf).cache()
    try {
      val perDoc = sig.groupBy($"doc_id").agg(count(lit(1)).as("c"),
        countDistinct($"i").as("di"))
      assert(perDoc.filter($"c" =!= 16 || $"di" =!= 16).count() === 0,
        "every signed doc must carry exactly the 16 hash rows")
      // independent in-memory recomputation on 3 sample docs
      val docs = graft.sources.Tables.documents(spark, sf)
        .filter($"doc_id" < 3).select($"doc_id", $"text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      def md5hex(s: String) =
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
      val got = sig.filter($"doc_id" < 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      for ((id, text) <- docs) {
        val toks = text.split(" ")
        if (toks.length >= 3) {
          val shingles = toks.sliding(3).map(_.mkString(" ")).toSet
          // respect the df<=50 cap by only checking docs whose shingles all
          // survived (cap removals would shrink the min domain)
          val expectedCount = got.count(_._1._1 == id)
          if (expectedCount == 16) {
            for (i <- 0 to 15) {
              val mins = shingles.toSeq.map { s =>
                val h = md5hex(s)
                val lo = java.lang.Long.parseLong(h.substring(0, 14), 16)
                val hi = java.lang.Long.parseLong(h.substring(16, 30), 16)
                (lo + i * hi) % 72057594037927936L
              }
              // engine min is over CAPPED shingles ⊆ ours, so it's >= our min
              // and equal when no shingle of this doc was capped
              assert(got((id, i.toLong)) >= mins.min,
                s"doc $id hash $i below the uncapped min")
            }
          }
        }
      }
    } finally sig.unpersist()
  }

  test("q495 lsh candidate audit: verified+missed == exact q45 pair set, statuses disjoint") {
    import spark.implicits._
    val rows = graft.llm.Dedup.q495LshCandidateAudit.fn(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(3)))
    assert(rows.map(_._1).distinct.length === rows.length, "one row per pair")
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val exact = graft.llm.Dedup.q45NeardupJaccard.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = byStatus.getOrElse("verified", Set.empty)
    val missed = byStatus.getOrElse("missed", Set.empty)
    val candOnly = byStatus.getOrElse("candidate_only", Set.empty)
    assert((verified ++ missed) === exact,
      "verified ∪ missed must reconstruct the exact pair set")
    assert((candOnly & exact).isEmpty, "candidate_only pairs must fail the threshold")
    assert(verified.nonEmpty, "smoke corpus must contain caught pairs")
  }

  test("q496 c4 line filters: verdict arithmetic and line count law") {
    import spark.implicits._
    val out = graft.llm.TextAnalysis.q496C4LineFilters.fn(spark, sf).cache()
    try {
      val words = graft.sources.Tables.documents(spark, sf)
        .select($"doc_id", size(split($"text", " ")).cast("long").as("w"))
      val bad = out.join(words, Seq("doc_id")).filter(
        $"n_lines" =!= expr("(w + 7) div 8") ||
          $"pass" =!= ($"n_good" >= 3 && $"good_ppm" >= 600000) ||
          $"n_good" > $"n_lines")
      assert(bad.count() === 0)
      assert(out.filter($"pass").count() > 0 && out.filter(!$"pass").count() > 0,
        "line filter must split the corpus")
    } finally out.unpersist()
  }

  test("q497 stratified reservoir: exactly k per stratum, rank-1 is the true md5 minimum") {
    import spark.implicits._
    val rows = graft.llm.Curation.q497StratifiedReservoir.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    assert(perLang.values.forall(_.map(_._2).sorted.sameElements(Seq(1L, 2L, 3L))))
    def pri(id: Long) = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 14), 16)
    val truth = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getString(1) -> r.getLong(0)).groupBy(_._1)
      .view.mapValues(_.map(_._2).minBy(id => (pri(id), id))).toMap
    for ((lang, _, doc) <- rows.filter(_._2 == 1L))
      assert(doc === truth(lang), s"rank-1 for $lang is not the md5 minimum")
  }

  test("q498 class weights: census sums to corpus, inverse-frequency anti-monotone in class size") {
    import spark.implicits._
    val rows = graft.operators.Eda.q498ClassWeights.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === total)
    for (pair <- rows.sortBy(_._2).sliding(2); if pair.length == 2) {
      val (a, b) = (pair(0), pair(1))
      if (a._2 < b._2) {
        assert(a._3 >= b._3, s"inv_freq must not increase with class size: $a vs $b")
        assert(a._4 >= b._4, s"sqrt weight must not increase with class size: $a vs $b")
      }
    }
  }

  test("q499 jaccard histogram: bins partition the pair set and the >=0.8 tail equals q45") {
    import spark.implicits._
    val rows = graft.llm.Dedup.q499JaccardHistogram.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val cums = rows.sortBy(_._1).map(_._3)
    assert(cums.reverse.sameElements(cums.reverse.sorted),
      "cumulative >= share must be non-increasing in bin")
    assert(rows.minBy(_._1)._3 === 1000000L, "lowest bin's tail covers everything")
    // bin >= 16 <=> 20*shared >= 16*union <=> jaccard >= 0.8 exactly
    val tail = rows.filter(_._1 >= 16).map(_._2).sum
    val exact = graft.llm.Dedup.q45NeardupJaccard.fn(spark, sf).count()
    assert(tail === exact, s"histogram tail $tail != q45 pair count $exact")
  }

  test("q493 detector agreement: intersection bounded by both pair sets") {
    val r = graft.llm.Dedup.q493DetectorAgreement.fn(spark, sf).head()
    val (ns, nj, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nb <= math.min(ns, nj))
    assert(r.getLong(3) <= 1000000L && r.getLong(4) <= 1000000L)
    assert(ns > 0 && nj > 0, "smoke corpus must exercise both detectors")
  }
}
