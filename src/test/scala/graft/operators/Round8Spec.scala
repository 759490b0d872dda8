package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Law specs for the round-10 batch (q427–q429): each test checks the
  * property that makes the operator correct, via an independent
  * formulation the DuckDB value-hash cannot explain (SURVEY.md §5). */
class Round8Spec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  /** Reference Luhn in plain Scala — the independent implementation. */
  private def luhnRef(digits: Seq[Int]): Boolean = {
    val sum = digits.reverse.zipWithIndex.map { case (d, j) =>
      if (j % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  test("luhnValid matches the reference on known PANs and rejects off-by-one check digits") {
    import spark.implicits._
    // 4111111111111111 / 5555555555554444 are the canonical valid test
    // PANs; each +1 on the check digit must flip the verdict.
    val pans = Seq("4111111111111111", "4111111111111112",
      "5555555555554444", "5555555555554445", "1234567812345670",
      "0000000000000000")
    val df = pans.toDF("pan").select($"pan",
      Governance.luhnValid(transform(sequence(lit(1), length($"pan")),
        i => $"pan".substr(i, lit(1)).cast("long"))).as("ok"))
    for (r <- df.collect()) {
      val pan = r.getString(0)
      assert(r.getBoolean(1) === luhnRef(pan.map(_ - '0')),
        s"luhnValid disagrees with the reference on $pan")
    }
  }

  test("q427: engine Luhn verdicts equal a driver-side MD5+Luhn recompute row-for-row") {
    import spark.implicits._
    val got = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey",
        Governance.luhnValid(Governance.candidateDigits($"c_custkey")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val mdig = java.security.MessageDigest.getInstance("MD5")
    for ((k, ok) <- got) {
      val hex = mdig.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      val digits = hex.map(c => Integer.parseInt(c.toString, 16) % 10)
      assert(ok === luhnRef(digits), s"custkey $k: engine $ok vs reference")
    }
    assert(got.nonEmpty)
  }

  test("q428: exact_pairs equals a direct join count; CMS never undercounts; ε-bound holds") {
    import spark.implicits._
    val row = Profiler.q428CmsJoinSize.fn(spark, sf).collect()(0)
    val direct = graft.sources.Tables.events(spark, sf).select($"user_id")
      .join(graft.sources.Tables.orders(spark, sf)
        .select($"o_custkey"), $"user_id" === $"o_custkey")
      .count()
    assert(row.getLong(0) === direct, "exact_pairs must equal the executed join")
    assert(row.getLong(2) >= 0L, "CMS inner product must never undercount")
    assert(row.getLong(3) === 1L, "the ε·N1·N2 guarantee must hold")
  }

  test("q429: duplicated-span profile is halving-monotone and the width-2 row equals a direct bigram census") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = graft.llm.Chunking.q429PrefixDoublingSpans.fn(spark, sf)
      .orderBy($"span_len").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L, 16L, 32L))
    // A duplicated 2w-span's left half is a duplicated w-span at the same
    // position, so the duplicated-position count can only shrink as spans
    // double; ditto the largest class.
    for (i <- 1 until rows.length) {
      assert(rows(i).getLong(2) <= rows(i - 1).getLong(2),
        s"dup_positions must be non-increasing at span ${rows(i).getLong(0)}")
      assert(rows(i).getLong(3) <= rows(i - 1).getLong(3),
        s"max_class_size must be non-increasing at span ${rows(i).getLong(0)}")
    }
    // Independent width-2 recompute: group raw adjacent token pairs.
    val tok = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", posexplode(split(lower($"text"), "[^a-z]+")))
      .withColumnRenamed("col", "t").filter($"t" =!= "")
    val big = tok
      .withColumn("t2", lead($"t", 1).over(
        Window.partitionBy($"doc_id").orderBy($"pos")))
      .filter($"t2".isNotNull)
      .groupBy($"t", $"t2").agg(count(lit(1)).as("n"))
      .agg(count(when($"n" >= 2, 1)).cast("long").as("dc"),
        coalesce(sum(when($"n" >= 2, $"n")), lit(0)).cast("long").as("dp"),
        coalesce(max($"n"), lit(0)).cast("long").as("mx"))
      .collect()(0)
    assert(rows(1).getLong(1) === big.getLong(0), "width-2 dup_classes")
    assert(rows(1).getLong(2) === big.getLong(1), "width-2 dup_positions")
    assert(rows(1).getLong(3) === big.getLong(2), "width-2 max_class_size")
  }

  test("q430: per-source fertility equals a driver-side greedy longest-match reference") {
    import spark.implicits._
    // Rebuild the vocab + word censuses with independent one-liner SQL,
    // run the greedy cursor in plain Scala, and compare the census.
    val tok = graft.sources.Tables.documents(spark, sf)
      .select($"source", explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t" =!= "")
    val wc = tok.groupBy($"t").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = wc.values.sum
    val sub = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- wc; d <- 1 to 4; i <- 0 to w.length - d)
      sub(w.substring(i, i + d)) = sub.getOrElse(w.substring(i, i + d), 0L) + n
    val vocab = sub.filter(_._2 >= tot / 50).keySet
    def greedy(w: String): Long = {
      var pos = 0; var ntok = 0L
      while (pos < w.length) {
        val d = (4 to 2 by -1).find(d =>
          pos + d <= w.length && vocab(w.substring(pos, pos + d))).getOrElse(1)
        pos += d; ntok += 1
      }
      ntok
    }
    val expect = tok.groupBy($"source", $"t").agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0)).map { case (s, rs) =>
        val occ = rs.map(_.getLong(2)).sum
        val tk = rs.map(r => r.getLong(2) * greedy(r.getString(1))).sum
        s -> (occ, tk, 1000000L * tk / occ, rs.map(r => greedy(r.getString(1))).max)
      }
    val got = graft.llm.TextAnalysis.q430WordpieceGreedy.fn(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (occ, tk, fert, mx) = expect(r.getString(0))
      assert(r.getLong(1) === occ && r.getLong(2) === tk &&
        r.getLong(3) === fert && r.getLong(4) === mx,
        s"source ${r.getString(0)} disagrees with the reference greedy")
    }
  }

  test("q431: three IPF rounds hit the tiered row target and preserve the length-bucket margin") {
    import spark.implicits._
    val df = graft.llm.Curation.q431IpfRaking.fn(spark, sf)
    val rows = df.collect()
    assert(rows.forall(_.getLong(3) > 0L), "weights must stay positive")
    // Row margin: achieved within 100 ppm of the tiered target.
    for (r <- rows)
      assert(math.abs(r.getLong(4) - r.getLong(5)) <= 100L,
        s"row margin off for ${r.getString(0)}: ${r.getLong(4)} vs ${r.getLong(5)}")
    // Column margin: the final scaling step is a column step, so the
    // weighted bucket mix must match the observed mix within truncation.
    val tot = rows.map(r => r.getLong(2) * r.getLong(3)).sum
    val ntot = rows.map(_.getLong(2)).sum
    val byBucket = rows.groupBy(_.getString(1))
    for ((b, rs) <- byBucket) {
      val ach = 1000000.0 * rs.map(r => r.getLong(2) * r.getLong(3)).sum / tot
      val obs = 1000000.0 * rs.map(_.getLong(2)).sum / ntot
      assert(math.abs(ach - obs) <= 100.0,
        s"bucket $b margin drifted: $ach vs $obs")
    }
  }

  test("q432: one draw per event, coin inversion matches a driver reference, census tracks expectation") {
    import spark.implicits._
    val rows = graft.llm.Curation.q432NegativeSampling.fn(spark, sf).collect()
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === nEvents,
      "every event must contribute exactly one draw")
    // Driver-side inversion reference: rebuild the cumulative table from
    // the output rows (w, n are in the output; s = sqrt(n)) and re-invert
    // 200 coins; the census of those coins must agree with a direct
    // filtered recount of the engine's own per-event assignment.
    val iv = rows.sortBy(_.getString(0)).map(r => (r.getString(0),
      math.sqrt(r.getLong(1).toDouble)))
    val cums = iv.scanLeft(("", 0.0)) { case ((_, acc), (w, s)) => (w, acc + s) }
      .drop(1)
    val st = cums.last._2
    def invert(u: Double): String = cums.find(_._2 > u).get._1
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val eventIds = graft.sources.Tables.events(spark, sf)
      .select($"event_id").collect().map(_.getLong(0))
    val refCensus = eventIds.map { id =>
      val hex = mdig.digest(s"neg:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 281474976710656.0 * st
      invert(u)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // The engine's census must equal the reference inversion EXACTLY,
    // word for word — this checks the binned-interval join inverts the
    // same cumulative table with the same boundaries.
    for (r <- rows)
      assert(r.getLong(2) === refCensus.getOrElse(r.getString(0), 0L),
        s"word ${r.getString(0)}: engine ${r.getLong(2)} vs reference census")
    // And the census must track expectation within 2x on high-mass words.
    for (r <- rows if r.getDouble(4) >= 30000.0) {
      val ratio = r.getLong(3).toDouble / r.getDouble(4)
      assert(ratio > 0.5 && ratio < 2.0,
        s"word ${r.getString(0)} drawn_ppm ${r.getLong(3)} vs expect ${r.getDouble(4)}")
    }
  }

  test("q433: n-gram token-count identity and type bounds hold per source") {
    import spark.implicits._
    val rows = graft.llm.TextAnalysis.q433DistinctN.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // Exact identity: every doc of L tokens yields L-(n-1) n-grams, so
    // tokens(n) = tokens(1) - (n-1) * n_docs when all docs have >= n
    // tokens (true for this corpus: min doc length >> 3).
    val docsPerSource = graft.sources.Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = rows.groupBy(_._1)
    for ((s, rs) <- bySource) {
      val t1 = rs.find(_._2 == 1L).get._4
      for ((_, n, types, tokens, ppm) <- rs) {
        assert(tokens === t1 - (n - 1) * docsPerSource(s),
          s"token identity broken for $s n=$n")
        assert(types <= tokens && types > 0)
        assert(ppm === 1000000L * types / tokens)
      }
    }
    assert(rows.length === docsPerSource.size * 3)
  }

  test("q434: on a ring grow, keys move ONLY to the new shard and totals are conserved") {
    val rows = graft.operators.Skew.q434ConsistentRing.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byShard = rows.map(r => r._1 -> r).toMap
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === nDocs && rows.map(_._3).sum === nDocs,
      "both assignments must cover every key exactly once")
    val (_, nb5, na5, mv5) = byShard("s5")
    assert(nb5 === 0L, "the new shard holds nothing before the grow")
    assert(mv5 === 0L, "the new shard cannot lose keys it never had")
    assert(rows.map(_._4).sum === na5,
      "every moved key must land on the NEW shard - old shards never trade")
    for ((s, nb, na, mv) <- rows if s != "s5")
      assert(na === nb - mv, s"$s after-count must be before minus moved")
  }
}
