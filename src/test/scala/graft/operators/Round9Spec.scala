package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Law specs for the round-11 batch (q435, q436): independent BigInt /
  * plain-Scala recomputation of each operator's arithmetic, plus the
  * algebraic identity that makes the formula a probability model at all. */
class Round9Spec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  /** Exact bigram census at sf0.001, in plain Scala (independent of the
    * engine's explode/agg path). */
  private lazy val bigramCounts: Map[(String, String), Long] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(t => { val w = t.split(" ", -1); w.dropRight(1).zip(w.drop(1)) })
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
  }

  test("q435 Kneser-Ney: engine ppm equals exact BigInt recomputation") {
    val c12 = bigramCounts
    val n1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nf1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val npre = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = c12.size.toLong
    val out = graft.llm.TextAnalysis.q435KneserNey.fn(spark, sf).collect()
    assert(out.length === 50)
    out.foreach { r =>
      val w1 = r.getAs[String]("w1"); val w2 = r.getAs[String]("w2")
      val n12 = BigInt(c12((w1, w2)))
      val num = BigInt(1000000) *
        ((BigInt(4) * n12 - 3).max(BigInt(0)) * b + BigInt(3) * nf1(w1) * npre(w2))
      val den = BigInt(4) * n1(w1) * b
      assert(BigInt(r.getAs[Long]("pkn_ppm")) === num / den,
        s"ppm mismatch for ($w1, $w2)")
      assert(r.getAs[Long]("n12") === c12((w1, w2)))
    }
  }

  test("q435 Kneser-Ney: P(.|w1) sums to exactly 1 over the seen vocab (rational)") {
    // Sum over ALL seen w2 of P_KN(w2|w1) must be exactly 1:
    //   sum(max(n12-D,0))/n1 = (n1 - D*nf1)/n1 and sum(npre2) over seen
    //   bigram types = B, so the lambda term restores exactly D*nf1/n1.
    // Verified in exact rationals (numerator aggregation over common
    // denominator 4*n1*B) for the 5 highest-volume contexts.
    val c12 = bigramCounts
    val n1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nf1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val npreAll = c12.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = BigInt(c12.size)
    val top5 = n1.toSeq.sortBy(-_._2).take(5).map(_._1)
    // lambda mass uses the FULL continuation distribution (all seen w2),
    // not just w2 observed after w1 — that is what interpolated KN means.
    top5.foreach { w1 =>
      val seenAfter = c12.collect { case ((a, w2), n12) if a == w1 => (w2, n12) }
      val discounted = seenAfter.map { case (_, n12) =>
        (BigInt(4) * n12 - 3).max(BigInt(0)) * b }.sum
      val lambdaMass = BigInt(3) * nf1(w1) *
        npreAll.values.map(BigInt(_)).sum // = 3*nf1*B
      val total = discounted + lambdaMass
      assert(total === BigInt(4) * n1(w1) * b, s"KN mass broken for context $w1")
    }
  }

  test("q438 Platt: calibrated NLL beats the base rate and the gradient has vanished") {
    import spark.implicits._
    val r = Eda.q438PlattScaling.fn(spark, sf).head()
    val a = r.getAs[Double]("a_platt"); val b = r.getAs[Double]("b_platt")
    assert(r.getAs[Double]("nll_platt") <= r.getAs[Double]("nll_base") + 1e-9,
      "calibration must not lose to the base-rate model")
    // independent convergence check: MLE gradient at (a, b) ~ 0 in Scala
    val pts = graft.sources.Tables.embeddings(spark, sf)
      .select(element_at($"embedding", 1).cast("double").as("x"),
        when($"label" === 0, 1.0).otherwise(0.0).as("y"))
      .collect().map(row => (row.getDouble(0), row.getDouble(1)))
    val g = pts.map { case (x, y) =>
      val p = 1.0 / (1.0 + math.exp(-(a * x + b))); ((p - y) * x, p - y)
    }
    val n = pts.length
    assert(math.abs(g.map(_._1).sum / n) < 1e-3, "dL/da not ~0 at the fit")
    assert(math.abs(g.map(_._2).sum / n) < 1e-3, "dL/db not ~0 at the fit")
  }

  test("q439 unigram Viterbi: optimal cost, concatenation identity, vs independent DP") {
    import spark.implicits._
    // fixture vocab with a known cost structure
    val vocab = Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.0, "ab" -> 1.5,
      "bc" -> 1.5, "abc" -> 2.4, "abca" -> 5.0)
    val words = Seq("abc", "abca", "cab", "aabbcc", "a")
    val wc = words.toDF("w").withColumn("n", lit(1L))
    val vmapRow = vocab.toSeq.sortBy(_._1).toDF("s", "cost")
      .agg(org.apache.spark.sql.functions.map_from_entries(
        sort_array(collect_list(struct($"s", $"cost")))).as("vmap"))
    val got = graft.llm.TextAnalysis.unigramViterbi(wc, vmapRow)
      .collect().map(r => r.getAs[String]("w") ->
        (r.getSeq[String](2), r.getAs[Double]("cost"))).toMap
    // independent full DP in plain Scala
    def ref(w: String): Double = {
      val best = Array.fill(w.length + 1)(Double.MaxValue); best(0) = 0.0
      for (i <- 1 to w.length; d <- 1 to math.min(4, i))
        vocab.get(w.substring(i - d, i)).foreach { c =>
          if (best(i - d) + c < best(i)) best(i) = best(i - d) + c }
      best(w.length)
    }
    words.foreach { w =>
      val (pieces, cost) = got(w)
      assert(pieces.mkString === w, s"segmentation of $w must concatenate back")
      assert(pieces.forall(vocab.contains), s"pieces of $w must be in-vocab")
      assert(math.abs(pieces.map(vocab).sum - cost) < 1e-9, s"cost identity for $w")
      assert(math.abs(cost - ref(w)) < 1e-9, s"DP optimality for $w")
    }
    // "abc": piece 'abc' costs 2.4 < a+bc = 3.5 < ab+c = 3.5 — must pick it
    assert(got("abc")._1 === Seq("abc"))
    // and the real corpus query emits rows with integer invariants intact
    val out = graft.llm.TextAnalysis.q439UnigramLmRound.fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("prob_ppm") <= 1000000L))
  }

  test("q440 Poisson: gradient vanished at the fit and deviance beats intercept-only") {
    import spark.implicits._
    val r = Eda.q440PoissonRegression.fn(spark, sf).head()
    val a = r.getAs[Double]("a_pois"); val b = r.getAs[Double]("b_pois")
    val pts = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).cast("double").as("y"),
        datediff(max($"ts".cast("date")), min($"ts".cast("date")))
          .cast("double").as("x"))
      .collect().map(row => (row.getAs[Double]("x"), row.getAs[Double]("y")))
    val n = pts.length
    // independent Newton replay to full convergence (12 steps) — the
    // engine's 4dp-rounded coefficients must match the true MLE's
    var (ra, rb) = (math.log(pts.map(_._2).sum / n), 0.0)
    for (_ <- 1 to 12) {
      var (g1, g2, h11, h12, h22) = (0.0, 0.0, 0.0, 0.0, 0.0)
      pts.foreach { case (x, y) =>
        val mu = math.exp(ra + rb * x)
        g1 += y - mu; g2 += (y - mu) * x
        h11 += mu; h12 += mu * x; h22 += mu * x * x
      }
      val det = h11 * h22 - h12 * h12
      ra += (h22 * g1 - h12 * g2) / det
      rb += (h11 * g2 - h12 * g1) / det
    }
    assert(math.abs(a - ra) <= 1e-4 + 1e-9, s"a_pois $a vs converged MLE $ra")
    assert(math.abs(b - rb) <= 1e-4 + 1e-9, s"b_pois $b vs converged MLE $rb")
    // deviance must not exceed the intercept-only (null) deviance
    def dev(mu: Double => Double) = 2 * pts.map { case (x, y) =>
      (if (y > 0) y * math.log(y / mu(x)) else 0.0) - (y - mu(x)) }.sum
    val ybar = pts.map(_._2).sum / n
    assert(r.getAs[Double]("deviance") <= dev(_ => ybar) + 1e-6)
  }

  test("q459 scan partitioning: bigger byte budget never yields more partitions") {
    val rows = graft.sources.PartitionedSink.q459ScanPartitioning.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.sliding(2).forall { case Array((_, a), (_, b)) => b <= a },
      "partition count must be monotone non-increasing in maxPartitionBytes")
    assert(rows.head._2 > 1L, "64KB budget must actually split the scan")
    assert(spark.conf.getOption("spark.sql.files.maxPartitionBytes").isEmpty ||
      spark.conf.get("spark.sql.files.maxPartitionBytes") != "65536",
      "q459 must restore the session setting")
  }

  test("q436 SES backtest: engine MAE equals plain-Scala replay for each priority") {
    import spark.implicits._
    val daily = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderdate".as("d"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("cents"))
      .orderBy($"pri", $"d")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("cents")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val got = Eda.q436SesBacktest.fn(spark, sf).collect()
      .map(r => r.getAs[String]("pri") ->
        (r.getAs[Long]("n_eval"), r.getAs[Long]("ses_mae_x100"),
          r.getAs[Long]("naive_mae_x100"))).toMap
    assert(got.nonEmpty)
    daily.foreach { case (pri, xs) =>
      if (xs.length > 20) {
        val evals = (20 until xs.length).map { t =>
          val ses = (1 to 20).map(k => xs(t - k) * (1L << (20 - k))).sum / 1048575L
          val naive = xs(t - 1)
          (math.abs(xs(t) - ses), math.abs(xs(t) - naive))
        }
        val (n, sesMae, naiveMae) = got(pri)
        assert(n === evals.length.toLong, s"n_eval for $pri")
        assert(sesMae === 100L * evals.map(_._1).sum / evals.length, s"ses mae for $pri")
        assert(naiveMae === 100L * evals.map(_._2).sum / evals.length, s"naive mae for $pri")
      }
    }
  }
}
