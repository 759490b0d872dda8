package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Domain-law gates for the round-10 additions (q511–q513) and the new
  * TwoPhase.lagOne primitive, beyond their strict oracles. */
class Round14Spec extends AnyFunSuite with graft.SparkFixture {

  test("q511 power iteration matches an independent in-memory BigInt reference") {
    import spark.implicits._
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .select($"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val xq = rows.map { case (lb, e) =>
      (lb, e.map(x => math.floor(x.toDouble * 1024).toLong)) }
    val n = BigInt(xq.length)
    val dim = 64
    val g = Array.ofDim[BigInt](dim, dim)
    val s = Array.fill(dim)(BigInt(0))
    for (i <- 0 until dim; j <- 0 until dim) g(i)(j) = BigInt(0)
    xq.foreach { case (_, v) =>
      for (i <- 0 until dim) {
        s(i) += v(i)
        for (j <- 0 until dim) g(i)(j) += BigInt(v(i)) * v(j)
      }
    }
    val m = Array.tabulate(dim, dim)((i, j) => n * g(i)(j) - s(i) * s(j))
    def matVec(v: Array[BigInt]) =
      Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    def fdiv(a: BigInt, b: BigInt) = { val q = a.abs / b; if (a < 0) -q else q }
    var v = Array.fill(dim)(BigInt(1000000))
    for (_ <- 1 to 8) {
      val w = matVec(v)
      val sn = w.map(_.abs).sum.max(BigInt(1))
      v = w.map(wi => fdiv(wi * 1000000, sn))
    }
    val w9 = matVec(v)
    val lambda = ((0 until dim).map(i => v(i) * w9(i)).sum /
      (0 until dim).map(i => v(i) * v(i)).sum.max(BigInt(1))).toLong
    assert(lambda >= 0, "Rayleigh quotient of a PSD matrix must be nonnegative")
    val refProj = xq.groupBy(_._1).view.mapValues { vs =>
      (vs.length.toLong,
        vs.map { case (_, x) => (0 until dim).map(i => BigInt(x(i)) * v(i)).sum }
          .sum.toLong)
    }.toMap
    val got = graft.llm.Similarity.q511PowerIteration.fn(spark, sf).collect()
    assert(got.length === refProj.size)
    got.foreach { r =>
      val lb = r.getLong(r.fieldIndex("label"))
      val (rn, rp) = refProj(lb)
      assert(r.getLong(r.fieldIndex("n_vecs")) === rn)
      assert(r.getLong(r.fieldIndex("proj_sum")) === rp, s"label $lb proj_sum")
      assert(r.getLong(r.fieldIndex("lambda")) === lambda)
    }
  }

  test("q512 bloom filter admits no false negatives and its exact side matches a direct join") {
    import spark.implicits._
    val got = graft.llm.Dedup.q512BloomDecontam.fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bd = r.getLong(r.fieldIndex("bloom_docs"))
      val ed = r.getLong(r.fieldIndex("exact_docs"))
      val fp = r.getLong(r.fieldIndex("fp_docs"))
      assert(ed <= bd, "exact hit implies bloom hit (no false negatives)")
      assert(fp === bd - ed, "every exact-hit doc is a bloom-hit doc")
      assert(r.getLong(r.fieldIndex("sh_exact")) <= r.getLong(r.fieldIndex("sh_bloom")))
    }
    // independent exact-contamination recompute (no bloom anywhere)
    val docs = graft.sources.Tables.documents(spark, sf)
    val sh = docs.select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"t") - 2),
        i => concat_ws(" ", slice($"t", i, lit(3))))).as("s"))
      .distinct()
    val ev = sh.filter($"doc_id" % 50 === 0).select($"s").distinct()
    val exact = sh.filter($"doc_id" % 50 =!= 0)
      .join(ev, Seq("s"))
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(countDistinct($"doc_id").as("ed"), count(lit(1)).as("es"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { r =>
      val src = r.getString(r.fieldIndex("source"))
      val (ed, es) = exact.getOrElse(src, (0L, 0L))
      assert(r.getLong(r.fieldIndex("exact_docs")) === ed, s"$src exact_docs")
      assert(r.getLong(r.fieldIndex("sh_exact")) === es, s"$src sh_exact")
    }
  }

  test("TwoPhase.lagOne equals the single-window lag, boundary rows included") {
    import spark.implicits._
    val df = spark.range(0, 997).select(
      $"id",
      (($"id" * 37) % 13).as("k"),
      concat(lit("v"), ($"id" * 7919 % 101).cast("string")).as("payload"))
    val sorts = Seq($"k", $"id")
    val two = TwoPhase.lagOne(df, $"k", sorts, $"payload", "lagged")
      .select($"id", $"lagged").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val ref = df.withColumn("lagged", lag($"payload", 1).over(Window.orderBy(sorts: _*)))
      .select($"id", $"lagged").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(two === ref)
  }

  test("q514 token bucket matches an independent in-memory replay and its invariants") {
    import spark.implicits._
    val got = graft.streaming.StreamingQueries.q514StreamTokenBucket.fn(spark, sf).collect()
    assert(got.nonEmpty)
    // independent replay: same event-time walk, plain Scala
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (u, t, e) => (u, t, e) }
    val Cap = 10000000L; val Cost = 1000000L
    val ref = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    evs.foreach { case (u, t, _) =>
      val (tok, last, n, adm) = ref.getOrElse(u, (Cap, Long.MinValue, 0L, 0L))
      val dt = if (last == Long.MinValue) 0L else t - last
      val filled = math.min(Cap, tok + dt / 60L)
      val admit = filled >= Cost
      ref(u) = (if (admit) filled - Cost else filled, t, n + 1L, adm + (if (admit) 1L else 0L))
    }
    got.foreach { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      val (tok, _, n, adm) = ref(u)
      assert(r.getLong(r.fieldIndex("n_events")) === n, s"user $u n_events")
      assert(r.getLong(r.fieldIndex("n_admitted")) === adm, s"user $u n_admitted")
      assert(r.getLong(r.fieldIndex("n_rejected")) === n - adm)
      assert(r.getLong(r.fieldIndex("tokens_u")) === tok, s"user $u tokens")
      assert(tok >= 0L && tok <= Cap)
    }
    assert(got.length === ref.size)
  }

  test("q515 mask plan is consistent with q501's census and interval bounds") {
    import spark.implicits._
    val mask = graft.llm.Dedup.q515DupSpanMask.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(mask.nonEmpty)
    mask.values.foreach { case (nChars, nPos, nSpans, masked, kept) =>
      assert(masked + kept === nChars)
      assert(masked <= nChars)
      // each merged span covers between 32 and 31 + its positions chars;
      // globally: masked ≥ 32·spans (every span ≥ one full gram) and
      // masked ≤ nPos + 31·spans (each position adds ≤ 1 char beyond the
      // previous except the 32-char span tails)
      assert(nSpans === 0L || masked >= 32L * nSpans)
      assert(masked <= nPos + 31L * nSpans)
      assert((nPos == 0L) === (nSpans == 0L))
    }
    // q501 counts DISTINCT dup grams per doc; q515 counts dup POSITIONS —
    // positions ≥ distinct grams, and both agree on WHICH docs are touched
    val census = graft.llm.Dedup.q501DupSpanCensus.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    census.foreach { case (doc, nDupGrams) =>
      mask.get(doc).foreach { case (_, nPos, _, _, _) =>
        assert((nPos > 0) === (nDupGrams > 0), s"doc $doc dup-flag parity")
        assert(nPos >= nDupGrams, s"doc $doc positions >= distinct grams")
      }
    }
  }

  test("q513 sorted-LCP census satisfies the trie identity on a hand fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "a x"), (4L, "q"), (5L, "a b c"))
      .toDF("doc_id", "text")
    // trie of token prefixes: (a),(a b),(a b c),(a b d),(a x),(q) = 6 nodes;
    // doc 5 duplicates doc 1 so contributes zero new prefixes
    val d = docs.select($"doc_id", split($"text", " ").as("t"))
    val lagged = TwoPhase.lagOne(d,
      substring(element_at($"t", 1), 1, 1), Seq($"t", $"doc_id"), $"t", "pt")
    val zw = zip_with($"t", $"pt", (x, y) => x <=> y)
    val pos = array_position(zw, false)
    val lcp = when($"pt".isNull, lit(0L))
      .otherwise(when(pos === 0, least(size($"t"), size($"pt")).cast("long"))
        .otherwise(pos - 1))
    val (tot, lcpSum) = lagged.select(size($"t").cast("long").as("n"), lcp.as("l"))
      .agg(sum($"n"), sum($"l")).collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(tot - lcpSum === 6L, s"trie size: $tot - $lcpSum")
    // live corpus: census sane and cacheable fraction strictly positive
    // (the synthetic corpus has template families by construction)
    val got = graft.llm.Curation.q513PrefixCacheCensus.fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(r.fieldIndex("lcp_tokens")) <= r.getLong(r.fieldIndex("sum_tokens")))
      assert(r.getLong(r.fieldIndex("cached_ppm")) >= 0L)
    }
  }
}
