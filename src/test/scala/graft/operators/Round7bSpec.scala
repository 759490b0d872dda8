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
