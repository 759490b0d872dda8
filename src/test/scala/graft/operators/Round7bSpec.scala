package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Law specs for the round-7 second batch (q401–q406): each test states
  * the property that makes the operator correct by construction, checked
  * against an independent in-Spark (or driver-reference) formulation —
  * the cross-check the DuckDB value-hash cannot explain (SURVEY.md §5). */
class Round7bSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("sinkhorn: column marginals hit the uniform target exactly after the final v-step") {
    import spark.implicits._
    // v ← q ⊘ Kᵀu is the LAST half-step, so Σ_i T_ij = v_j·(Kᵀu)_j = q_j
    // up to one rounding — the balancing guarantee of the scaling loop.
    val t = graft.llm.Curation.q401SinkhornMixture.fn(spark, sf)
    val col = t.groupBy($"lang_to").agg(sum($"t_ij").as("s"))
      .filter(abs($"s" - 0.2) > 1e-5)
    assert(col.count() === 0, "column marginal must equal the 1/5 target")
    // transport mass is a probability plan: non-negative, totals 1
    val tot = t.agg(sum($"t_ij")).collect()(0).getDouble(0)
    assert(math.abs(tot - 1.0) < 1e-5)
    assert(t.filter($"t_ij" < 0).count() === 0)
    // row marginals approach the corpus distribution (u-step one half-round
    // stale — loose tolerance is inherent, not a bug)
    val row = t.groupBy($"lang_from").agg(sum($"t_ij").as("s"), max($"p_from").as("p"))
      .filter(abs($"s" - $"p") > 0.05)
    assert(row.count() === 0, "row marginals must track the corpus mix")
  }

  test("grid DBSCAN equals brute-force DBSCAN row-for-row") {
    import spark.implicits._
    // The 3×3 cell join is lossless for ε = cell width: recompute the
    // ε-graph with the quadratic join and rerun the same role/label rules.
    val p = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id",
        element_at($"embedding", 1).cast("double").as("x"),
        element_at($"embedding", 2).cast("double").as("y"))
    val nbr = p.as("a").join(p.as("b"),
        $"a.vec_id" =!= $"b.vec_id" &&
          (($"a.x" - $"b.x") * ($"a.x" - $"b.x") +
            ($"a.y" - $"b.y") * ($"a.y" - $"b.y")) <= lit(0.000244140625))
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"))
    val deg = p.select($"vec_id")
      .join(nbr.groupBy($"va".as("vec_id")).agg(count(lit(1)).as("c")), Seq("vec_id"), "left")
      .select($"vec_id", (lit(1) + coalesce($"c", lit(0))).cast("long").as("n_eps"))
    val core = deg.filter($"n_eps" >= 4).select($"vec_id")
    val ce = nbr
      .join(core.select($"vec_id".as("va")), Seq("va"), "left_semi")
      .join(core.select($"vec_id".as("vb")), Seq("vb"), "left_semi")
    val lab = graft.llm.Dedup.starComponents(core.toDF("id"),
      ce.filter($"va" < $"vb").select($"va", $"vb"))._1.toDF("id", "cluster")
    val border = nbr
      .join(core.select($"vec_id".as("va")), Seq("va"), "left_anti")
      .join(lab.select($"id".as("vb"), $"cluster"), Seq("vb"))
      .groupBy($"va".as("vec_id")).agg(min($"cluster").as("cluster"))
    val brute = deg
      .join(lab.select($"id".as("vec_id"), $"cluster".as("cc")), Seq("vec_id"), "left")
      .join(border.select($"vec_id", $"cluster".as("bc")), Seq("vec_id"), "left")
      .select($"vec_id", $"n_eps",
        when($"cc".isNotNull, "core").when($"bc".isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce($"cc", $"bc", lit(-1L)).cast("long").as("cluster"))
    val grid = graft.llm.Similarity.q402GridDbscan.fn(spark, sf)
    assert(grid.exceptAll(brute).isEmpty && brute.exceptAll(grid).isEmpty,
      "grid-accelerated and brute-force DBSCAN must agree exactly")
    // the result exercises all three roles at the smoke tier
    val roles = grid.select($"role").distinct().as[String].collect().toSet
    assert(roles === Set("core", "border", "noise"))
  }

  test("Bradley-Terry matches a driver-side MM reference to 1e-9") {
    import spark.implicits._
    val out = Eda.q403BradleyTerry.fn(spark, sf)
      .select($"source", $"games", $"wins", $"strength").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // independent reference: same census, same MM recurrence, plain Scala
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val games = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val wins = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val played = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((id, (sa, ca)) <- docs; (sb, cb) <- docs.get(id + 1); if sa != sb) {
      val (i, j) = if (sa < sb) (sa, sb) else (sb, sa)
      games((i, j)) += 1
      played(sa) += 1; played(sb) += 1
      val winner = if (ca == cb) (if (sa < sb) sa else sb)
        else if (ca > cb) sa else sb
      wins(winner) += 1
    }
    val sources = played.keys.toSeq.sorted
    var pi = sources.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val raw = sources.map { s =>
        val den = sources.sorted.map { o =>
          val g = games.getOrElse(if (s < o) (s, o) else (o, s), 0L)
          if (g > 0) g.toDouble / (pi(s) + pi(o)) else 0.0
        }.sum
        s -> (if (den > 0) wins(s) / den else pi(s))
      }.toMap
      val tot = sources.map(raw).sum
      pi = raw.map { case (s, v) => s -> v * sources.size / tot }
    }
    assert(out.keySet === sources.toSet)
    for (s <- sources) {
      val (g, w, str) = out(s)
      assert(g === played(s), s"games($s)")
      assert(w === wins(s), s"wins($s)")
      // output is round(π, 6) — compare the reference at the same precision
      assert(math.abs(str - math.floor(pi(s) * 1e6 + 0.5) / 1e6) < 1e-12,
        s"strength($s): $str vs ${pi(s)}")
    }
  }

  test("distributed-selection percentiles equal the exact percentile aggregate") {
    import spark.implicits._
    val sel = Aggregates.q406PercentileSelection.fn(spark, sf)
      .select($"q", $"value").as[(Double, Double)].collect().toMap
    val c = graft.sources.Tables.orders(spark, sf)
      .select(floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    val exact = c.agg(
      expr("percentile(cents, 0.25)").as("p25"),
      expr("percentile(cents, 0.5)").as("p50"),
      expr("percentile(cents, 0.875)").as("p875")).collect()(0)
    // round(x, 4) is HALF_UP — mirror it (rint is half-even and differs
    // at exactly-representable .5 boundaries like .40625)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(sel(0.25) === r4(exact.getDouble(0) / 100))
    assert(sel(0.5) === r4(exact.getDouble(1) / 100))
    assert(sel(0.875) === r4(exact.getDouble(2) / 100))
  }

  test("Boruvka forest equals a driver-side Kruskal union-find reference") {
    import spark.implicits._
    val msf = Graph.q409BoruvkaMsf.fn(spark, sf)
      .select($"doc_a", $"doc_b", $"w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val edges = graft.llm.Dedup.q45NeardupJaccard.fn(spark, sf)
      .select($"doc_a", $"doc_b", round(lit(1.0) - $"jaccard", 4).as("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Kruskal with the same strict (w, doc_a, doc_b) total order
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val ref = scala.collection.mutable.Set[(Long, Long, Double)]()
    for ((a, b, w) <- edges.sortBy(e => (e._3, e._1, e._2))) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; ref += ((a, b, w)) }
    }
    assert(msf === ref.toSet, "Boruvka and Kruskal must produce the same unique MSF")
    // forest law: per component, |edges| = |vertices| - 1
    val comp = edges.flatMap(e => Seq(e._1, e._2)).distinct.groupBy(find).view.mapValues(_.size)
    assert(ref.size === comp.values.map(_ - 1).sum)
  }

  test("Shapley attribution satisfies the efficiency axiom") {
    import spark.implicits._
    val phi = EventAnalytics.q410ShapleyAttribution.fn(spark, sf)
      .select($"channel", $"shapley").as[(String, Double)].collect().toMap
    assert(phi.keySet === Set("click", "view", "signup", "error"))
    // Σφ_i = v(full touch-set) − v(∅): recompute the two cells directly
    val e = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
    val fp = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("pts"))
    val um = e.filter($"event_type" =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter($"pts".isNull || $"ts" < $"pts")
      .select($"user_id",
        when($"event_type" === "click", 1L).when($"event_type" === "view", 2L)
          .when($"event_type" === "signup", 4L).otherwise(8L).as("bit"),
        when($"pts".isNotNull, 1L).otherwise(0L).as("conv"))
      .groupBy($"user_id")
      .agg(sum_distinct($"bit").as("mask"), max($"conv").as("conv"))
    def vOf(mask: Long): Double = {
      val cell = um.filter($"mask" === mask)
        .agg(count(lit(1)).cast("long"), sum($"conv").cast("long")).collect()(0)
      if (cell.getLong(0) == 0) 0.0 else cell.getLong(1).toDouble / cell.getLong(0)
    }
    val lhs = phi.values.sum
    val rhs = vOf(15L) - vOf(0L)
    assert(math.abs(lhs - rhs) < 5e-6, s"efficiency: $lhs vs $rhs") // 4 × round-6 outputs
  }

  test("off-policy estimators: ESS and off-support diagnostics are consistent") {
    import spark.implicits._
    val r = EventAnalytics.q407OffPolicyEval.fn(spark, sf).collect()(0)
    val n = r.getAs[Long]("n")
    val offs = r.getAs[Long]("n_offsupport")
    val ess = r.getAs[Double]("ess")
    // ESS is at most the on-support count and positive
    assert(ess > 0 && ess <= (n - offs).toDouble)
    val errors = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "error").count()
    assert(offs === errors, "off-support rows are exactly the zero-weight actions")
    // value estimates are all within the value range of the log
    for (c <- Seq("naive_value", "ips_value", "snips_value"))
      assert(r.getAs[Double](c) >= 0.0 && r.getAs[Double](c) <= 500.0)
  }

  test("conformal: q-hat is the ceil((n+1)*0.9) order statistic and coverage is near 1-alpha") {
    import spark.implicits._
    val out = Eda.q408ConformalCoverage.fn(spark, sf).collect()
    assert(out.nonEmpty)
    for (row <- out) {
      val cov = row.getAs[Double]("coverage")
      assert(cov >= 0.75 && cov <= 1.0, s"coverage ${row.getAs[String]("grp")}: $cov")
      // rank-rule spot check: recount calibration scores ≤ q-hat — must be
      // at least the conformal rank (ties can only push it higher)
      val grp = row.getAs[String]("grp")
      val yhat = math.floor(row.getAs[Double]("yhat") * 100 + 0.5).toLong
      val qhat = math.floor(row.getAs[Double]("qhat") * 100 + 0.5).toLong
      val cal = graft.sources.Tables.orders(spark, sf)
        .filter($"o_orderpriority" === grp)
        .select(floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
          (conv(substring(md5($"o_orderkey".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).as("half"))
        .filter($"half" === 0)
        .select(abs($"cents" - yhat).as("s")).as[Long].collect().sorted
      val k = math.min(((cal.length + 1) * 9 + 9) / 10, cal.length)
      assert(cal(k - 1) === qhat, s"q-hat rank rule for $grp")
      assert(row.getAs[Long]("n_cal") === cal.length.toLong)
    }
  }

  test("systematic sample: exactly k picks, and two-phase cumsum equals one global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val out = graft.llm.Curation.q411SystematicSample.fn(spark, sf)
    assert(out.agg(sum($"n_picks")).collect()(0).getLong(0) === 20L,
      "Madow draw must allocate exactly k selection points")
    // reference: identical arithmetic on a single global-window cumsum
    val d = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars".as("w"),
        md5($"doc_id".cast("string")).as("h"))
    val c = d.withColumn("cb",
      coalesce(sum($"w").over(Window.orderBy($"h", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .crossJoin(broadcast(d.agg(sum($"w").cast("long").as("tw"))))
    val ref = c.select($"doc_id", $"source", $"w".cast("long").as("w"),
      (least(when(lit(40) * ($"cb" + $"w") <= $"tw", 0L)
        .otherwise(expr("(40 * (cb + w) - tw + 2 * tw - 1) div (2 * tw)")), lit(20L))
        - least(when(lit(40) * $"cb" <= $"tw", 0L)
          .otherwise(expr("(40 * cb - tw + 2 * tw - 1) div (2 * tw)")), lit(20L)))
        .cast("long").as("n_picks"))
      .filter($"n_picks" >= 1)
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty,
      "two-phase prefix-offset cumsum must equal the single-window draw")
  }

  test("sequential OBF: monotone cumulative counts, final look covers all purchases, one stop at most") {
    import spark.implicits._
    val r = Eda.q412SequentialObf.fn(spark, sf).orderBy($"look").collect()
    assert(r.length === 5)
    val totals = r.map(x => x.getAs[Long]("n_a") + x.getAs[Long]("n_b"))
    assert(totals.sliding(2).forall(p => p(0) <= p(1)), "looks are cumulative")
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(totals.last === purchases, "look 5 must cover the full 30-day window")
    val stops = r.filter(_.getAs[Int]("is_stop") === 1)
    assert(stops.length <= 1)
    for (s <- stops; earlier <- r.filter(_.getAs[Int]("look") < s.getAs[Int]("look")))
      assert(earlier.getAs[Int]("crossed") === 0, "stop must be the FIRST crossing")
  }

  test("cluster coherence: densities bounded, edges partition the q45 pair set") {
    import spark.implicits._
    val r = graft.llm.Dedup.q413ClusterCoherence.fn(spark, sf)
    assert(r.filter($"density_ppm" < 1 || $"density_ppm" > 1000000).count() === 0)
    assert(r.filter($"edges" > $"size" * ($"size" - 1) / 2).count() === 0)
    val pairTotal = graft.llm.Dedup.q45NeardupJaccard.fn(spark, sf).count()
    assert(r.agg(sum($"edges")).collect()(0).getLong(0) === pairTotal,
      "every near-dup pair lies in exactly one cluster")
    val t = r.select($"transitivity_ppm").distinct().as[Long].collect()
    assert(t.length === 1 && t(0) >= 0 && t(0) <= 1000000)
  }

  test("blocking quality: verified equals the q160 join, quadratic total never materialized") {
    import spark.implicits._
    val r = graft.llm.FuzzyJoin.q414BlockingQuality.fn(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_names")
    assert(r.getAs[Long]("total_pairs") === n * (n - 1) / 2)
    val q160 = graft.llm.FuzzyJoin.q160EditDistanceJoin.fn(spark, sf).count()
    assert(r.getAs[Long]("verified") === q160,
      "the audit's verified count must equal the production join")
    assert(r.getAs[Long]("candidates") >= r.getAs[Long]("verified"))
    assert(r.getAs[Long]("reduction_ppm") <= 1000000L)
    assert(r.getAs[Long]("max_block") >= 1L)
  }

  test("k-fold CV coefficients equal a direct refit of each fold's complement") {
    import spark.implicits._
    val out = Eda.q415KfoldCv.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("fold") ->
        ((r.getAs[Long]("n_train"), r.getAs[Double]("b"), r.getAs[Double]("a")))).toMap
    assert(out.size === 5)
    val d = graft.sources.Tables.lineitem(spark, sf).select(
      $"l_quantity".cast("long").as("x"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div 100").as("y"),
      (conv(substring(md5(concat($"l_orderkey".cast("string"), lit(":"),
        $"l_linenumber".cast("string"))), 1, 8), 16, 10).cast("long") % 5).as("fold"))
    val total = d.count()
    for ((fold, (nTrain, b, a)) <- out) {
      val ref = d.filter($"fold" =!= fold)
        .agg(count(lit(1)), expr("regr_slope(y, x)"), expr("regr_intercept(y, x)"))
        .collect()(0)
      assert(ref.getLong(0) === nTrain, s"n_train($fold)")
      assert(nTrain + d.filter($"fold" === fold).count() === total)
      assert(math.abs(b - ref.getDouble(1)) < 2e-6, s"b($fold): $b vs ${ref.getDouble(1)}")
      assert(math.abs(a - ref.getDouble(2)) < 2e-4, s"a($fold): $a vs ${ref.getDouble(2)}")
    }
  }

  test("Mann-Kendall S equals the pairwise sign sum over the collected series") {
    import spark.implicits._
    val r = Eda.q416MannKendall.fn(spark, sf).collect()(0)
    val series = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("v"))
      .orderBy($"d").select($"v").as[Long].collect()
    val s = (for (i <- series.indices; j <- i + 1 until series.length)
      yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
    assert(r.getAs[Long]("s") === s)
    assert(r.getAs[Long]("n") === series.length.toLong)
    // z sign agrees with S
    val z = r.getAs[Double]("z")
    assert(s == 0 && z == 0.0 || s > 0 && z >= 0.0 || s < 0 && z <= 0.0)
  }

  test("MaxSim retrieval matches a driver-side reference over collected token slices") {
    import spark.implicits._
    val out = graft.llm.Similarity.q417MaxsimRetrieval.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Double]("score")))).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def tokens(v: Array[Float]): Array[Array[Float]] =
      Array.tabulate(8)(t => v.slice(8 * t, 8 * t + 8))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < 8) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    for (q <- 0L until 3L) {
      val qt = tokens(vecs(q))
      val scored = vecs.toSeq.filter(_._1 != q).map { case (d, dv) =>
        val dt = tokens(dv)
        d -> qt.map(qv => dt.map(tv => dot(qv, tv)).max).sum
      }
      val top = scored.sortBy { case (d, sc) => (-sc, d) }.take(5)
      for (((d, sc), i) <- top.zipWithIndex) {
        val (od, os) = out((q, i + 1))
        assert(od === d, s"rank ${i + 1} of query $q")
        assert(math.abs(os - math.floor(sc * 1e6 + 0.5) / 1e6) < 1e-12)
      }
    }
  }

  test("RBO matches a driver-side recomputation and stays in [0, 1)") {
    import spark.implicits._
    val out = graft.llm.Similarity.q418RankBiasedOverlap.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("overlap10"), r.getAs[Double]("rbo")))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    // recompute from the two rankings, rebuilt driver-side from raw vectors
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dotd(a: Array[Float], b: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cosTop10(q: Long) = {
      val qv = e(q); val qn = math.sqrt(dotd(qv, qv))
      e.toSeq.filter(_._1 != q).map { case (d, dv) =>
        d -> dotd(qv, dv) / (qn * math.sqrt(dotd(dv, dv)))
      }.sortBy { case (d, c) => (-c, d) }.take(10).map(_._1)
    }
    def tokens(v: Array[Float]) = Array.tabulate(8)(t => v.slice(8 * t, 8 * t + 8))
    def maxsimTop10(q: Long) = {
      val qt = tokens(e(q))
      e.toSeq.filter(_._1 != q).map { case (d, dv) =>
        val dt = tokens(dv)
        d -> qt.map(x => dt.map(y => dotd(x, y)).max).sum
      }.sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
    }
    for (q <- 0L until 3L) {
      val (a, b) = (cosTop10(q), maxsimTop10(q))
      val rbo = 0.5 * (1 to 10).map { d =>
        val ov = (a.take(d).toSet intersect b.take(d).toSet).size
        (1.0 / (1L << (d - 1))) * ov / d
      }.sum
      val (ov10, rboOut) = out(q)
      assert(ov10 === (a.toSet intersect b.toSet).size.toLong)
      assert(math.abs(rboOut - math.floor(rbo * 1e6 + 0.5) / 1e6) < 1e-9, s"rbo($q)")
      assert(rboOut >= 0.0 && rboOut < 1.0)
    }
  }

  test("single-link MST cut equals direct components on the sub-threshold pair set (Gower-Ross)") {
    import spark.implicits._
    val out = Graph.q419SingleLinkCut.fn(spark, sf)
    val edges = graft.llm.Dedup.q45NeardupJaccard.fn(spark, sf)
      .select($"doc_a", $"doc_b",
        floor(round(lit(1.0) - $"jaccard", 4) * 10000 + 0.5).cast("long").as("w_bp"))
      .localCheckpoint(true)
    val verts = edges.select($"doc_a".as("id")).union(edges.select($"doc_b")).distinct()
    for (bp <- Seq(500L, 1500L)) {
      val direct = graft.llm.Dedup.starComponents(verts,
        edges.filter($"w_bp" <= bp).select($"doc_a", $"doc_b"))._1
        .select(lit(bp).as("tau_bp"), $"id".as("doc_id"), $"lbl".as("cluster"))
      val cut = out.filter($"tau_bp" === bp)
      assert(cut.exceptAll(direct).isEmpty && direct.exceptAll(cut).isEmpty,
        s"MST cut at $bp bp must equal components over ALL sub-threshold pairs")
    }
  }

  test("retrieval metrics match a driver-side recomputation") {
    import spark.implicits._
    val out = graft.llm.Similarity.q420RetrievalMetrics.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val byId = rows.map(r => r._1 -> r).toMap
    def dotd(a: Array[Float], b: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val ws = Seq(1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
      0.38685280723454163, 0.3562071871080222, 0.3333333333333333,
      0.31546487678572877, 0.3010299956639812, 0.2890648263178879)
    for (q <- 0L until 10L) {
      val (_, pl, qv) = byId(q)
      val qn = math.sqrt(dotd(qv, qv))
      val top = rows.filter(_._1 != q).map { case (d, dl, dv) =>
        (d, dl, dotd(qv, dv) / (qn * math.sqrt(dotd(dv, dv))))
      }.sortBy { case (d, _, c) => (-c, d) }.take(10)
      val rel = top.map(_._2 == pl)
      val totalRel = rows.count(r => r._1 != q && r._2 == pl)
      val o = out(q)
      assert(o.getAs[Long]("total_rel") === totalRel.toLong)
      assert(o.getAs[Long]("rel_top10") === rel.count(identity).toLong)
      val firstRel = rel.indexWhere(identity) match { case -1 => 0L; case i => i + 1L }
      assert(o.getAs[Long]("first_rel") === firstRel)
      val dcg = rel.zipWithIndex.map { case (r, i) => if (r) ws(i) else 0.0 }.sum
      val idcg = ws.take(math.min(totalRel, 10)).sum
      if (totalRel > 0) {
        val ndcg = o.getAs[Double]("ndcg")
        assert(math.abs(ndcg - dcg / idcg) < 2e-6, s"ndcg($q)")
      }
    }
  }

  test("jackknife ratio: theta is the plain ratio and the SE matches a driver recomputation") {
    import spark.implicits._
    val r = Eda.q421JackknifeRatio.fn(spark, sf).collect()(0)
    val buckets = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy((conv(substring(md5($"event_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 16).as("b"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("sc"),
        count(lit(1)).as("n"))
      .orderBy($"b")
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    val (tsc, tn) = (buckets.map(_._1).sum, buckets.map(_._2).sum)
    assert(r.getAs[Long]("n") === tn)
    assert(r.getAs[Double]("theta") ===
      math.floor(tsc.toDouble / (tn * 100).toDouble * 1e6 + 0.5) / 1e6)
    val g = buckets.length
    val thetas = buckets.map { case (sc, n) => (tsc - sc).toDouble / (tn - n).toDouble }
    val mean = thetas.sum / g
    val se = math.sqrt((g - 1).toDouble / g * thetas.map(t => (t - mean) * (t - mean)).sum) / 100
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-6)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("theta"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("theta"))
  }

  test("QTE: medians match the exact percentile and the CI brackets the median") {
    import spark.implicits._
    val r = Eda.q422QuantileTreatmentEffect.fn(spark, sf).collect()(0)
    val o = graft.sources.Tables.orders(spark, sf).select(
      ($"o_custkey" % 2).cast("long").as("arm"),
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    val meds = o.groupBy($"arm").agg(expr("percentile(cents, 0.5)").as("m"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("med_a") === r4(meds(0L) / 100))
    assert(r.getAs[Double]("med_b") === r4(meds(1L) / 100))
    assert(r.getAs[Double]("qte") === r4((meds(0L) - meds(1L)) / 100))
    assert(r.getAs[Double]("ci_a_lo") <= r.getAs[Double]("med_a"))
    assert(r.getAs[Double]("ci_a_hi") >= r.getAs[Double]("med_a"))
    assert(r.getAs[Double]("ci_b_lo") <= r.getAs[Double]("med_b"))
    assert(r.getAs[Double]("ci_b_hi") >= r.getAs[Double]("med_b"))
    assert(r.getAs[Double]("qte_lo") <= r.getAs[Double]("qte"))
    assert(r.getAs[Double]("qte_hi") >= r.getAs[Double]("qte"))
  }

  test("capture-recapture: overlap bounded by both catches, Chapman formula exact") {
    import spark.implicits._
    val r = graft.llm.Dedup.q423CaptureRecapture.fn(spark, sf).collect()(0)
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("m"))
    assert(m <= math.min(n1, n2))
    assert(r.getAs[Long]("chapman_estimate") === (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(r.getAs[Long]("true_pairs") > 0)
  }

  test("Good-Turing: totals and smoothed counts match the collected census") {
    import spark.implicits._
    val rows = graft.llm.TextAnalysis.q424GoodTuring.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the frequency-of-frequency census independently
    val ff = graft.sources.Tables.documents(spark, sf)
      .select(split($"text", " ").as("t")).filter(size($"t") >= 3)
      .select(explode(transform(sequence(lit(1), size($"t") - 2),
        i => concat_ws(" ", slice($"t", i, lit(3))))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("r"))
      .groupBy($"r").agg(count(lit(1)).as("n_r"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val nTokens = ff.map { case (r, n) => r * n }.sum
    val n1 = ff.getOrElse(1L, 0L)
    for (row <- rows) {
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") === ff(r))
      assert(row.getAs[Long]("n_r_next") === ff.getOrElse(r + 1, 0L))
      assert(row.getAs[Long]("n_tokens") === nTokens)
      val rStar = (r + 1) * ff.getOrElse(r + 1, 0L).toDouble / ff(r)
      assert(math.abs(row.getAs[Double]("r_star") - math.floor(rStar * 1e6 + 0.5) / 1e6) < 1e-12)
      assert(row.getAs[Double]("p_unseen") ===
        math.floor(n1.toDouble / nTokens * 1e6 + 0.5) / 1e6)
    }
  }

  test("Brier decomposition satisfies Murphy's identity") {
    val r = Eda.q425BrierDecomposition.fn(spark, sf).collect()(0)
    val brier = r.getAs[Double]("brier")
    val identity = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    // four round-6 outputs → identity holds within their combined rounding
    assert(math.abs(brier - identity) < 2.5e-6,
      s"Brier $brier must equal REL - RES + UNC = $identity")
    assert(r.getAs[Double]("reliability") >= 0 && r.getAs[Double]("resolution") >= 0)
  }

  test("DeLong AUC equals q322's rank-sum AUC and the CI brackets it") {
    val d = Eda.q426DelongAucCi.fn(spark, sf).collect()(0)
    val a = Eda.q322ExactAuc.fn(spark, sf).collect()(0)
    assert(d.getAs[Long]("n_pos") === a.getAs[Long]("n_pos"))
    assert(d.getAs[Long]("n_neg") === a.getAs[Long]("n_neg"))
    // the placement-mean identity: same AUC by a different derivation
    assert(d.getAs[Double]("auc") === a.getAs[Double]("auc"))
    assert(d.getAs[Double]("se") > 0)
    assert(d.getAs[Double]("ci_lo") < d.getAs[Double]("auc"))
    assert(d.getAs[Double]("ci_hi") > d.getAs[Double]("auc"))
  }

  test("lag sweep: lag 0 equals the direct same-hour Pearson; exactly one best flag") {
    import spark.implicits._
    val r = EventAnalytics.q405LagXcorr.fn(spark, sf)
    assert(r.count() === 7)
    assert(r.filter($"is_best" === 1).count() === 1)
    // shifting by L then correlating at 0 ≡ correlating at L: spot-check
    // the identity n is the same spine length minus |lag|
    val ns = r.select($"lag", $"n").as[(Int, Long)].collect().toMap
    val full = ns(0)
    for (l <- -3 to 3) assert(ns(l) === full - math.abs(l), s"n(lag=$l)")
  }
}
