package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Non-oracle gates for the graph ops (q154 is SQL-oracle'd; q155 PageRank
  * is float-iterative → fixture-pinned here). */
class GraphSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("PageRank: star-graph fixture converges to the closed form; mass is conserved") {
    import spark.implicits._
    // K_{1,3}: center 0, leaves 1..3. Closed form (damping 0.85, n=4):
    // C = 0.15 + 0.85*3L, L = 0.15 + 0.85*C/3  =>  C = 1.91892, L = 0.69369
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val converged = Graph.pageRank(star, iters = 40)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(converged(0L) - 1.91892) < 5e-3,
      s"center rank ${converged(0L)} != closed form 1.91892")
    for (v <- 1L to 3L)
      assert(math.abs(converged(v) - 0.69369) < 5e-3,
        s"leaf $v rank ${converged(v)} != closed form 0.69369")
    // 5-iteration catalog config: total mass stays n on a dangling-free graph
    val five = Graph.pageRank(star, iters = 5)
      .agg(sum($"rank")).head.getDouble(0)
    assert(math.abs(five - 4.0) < 1e-6, s"5-iter mass $five != 4.0")
  }

  test("PageRank on the co-order graph: deterministic across runs, ranks positive") {
    val a = Graph.q155PageRank.fn(spark, sf).collect()
    val b = Graph.q155PageRank.fn(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "q155 must be run-to-run deterministic")
    assert(a.nonEmpty && a.forall(_.getLong(1) > 0L))
  }

  test("fixed-point PageRank tracks the float helper within floor-div drift") {
    import spark.implicits._
    val e = Graph.coOrderEdges(spark, sf)
    val fp = Graph.pageRankFp(e, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fl = Graph.pageRank(e, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fp.keySet === fl.keySet)
    fp.foreach { case (v, r) =>
      // floor division leaks at most ~deg·iters units of 1e-12 per vertex;
      // 1e-6 relative slack is orders of magnitude above that
      assert(math.abs(r / 1e12 - fl(v)) <= 1e-6 * math.max(1.0, fl(v)),
        s"fp rank for $v drifted: ${r / 1e12} vs ${fl(v)}")
    }
  }

  test("k-core: K4 + pendant chain peels to exactly K4; 8-round horizon is a fixpoint at catalog scale") {
    import spark.implicits._
    // K4 on {1..4} (each deg 3) + chain 4-5-6: peeling must strip the chain
    // (deg 1-2) and keep K4 intact with within-core degree 3.
    val edges = ((for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .union(edges.select($"b".as("src"), $"a".as("dst"))).cache()
    val core = Graph.kCore(sym, k = 3, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // catalog horizon law: one extra round changes nothing (fixpoint)
    val e0 = Graph.coOrderEdges(spark, sf)
    val cat = e0.select($"a".as("src"), $"b".as("dst"))
      .union(e0.select($"b".as("src"), $"a".as("dst"))).cache()
    val r8 = Graph.kCore(cat, k = 3, rounds = 8).orderBy($"v").collect()
    val r9 = Graph.kCore(cat, k = 3, rounds = 9).orderBy($"v").collect()
    assert(r8.toSeq === r9.toSeq, "8-round peel must be a fixpoint at test scale")
  }

  test("HITS: closed-form A'A principal eigenvector on the bipartite fixture, L1 mass 1") {
    import spark.implicits._
    // hubs h1->{a,b}, h2->{b,c}: A'A has principal eigenvector (1,2,1)
    // (eigenvalue 3), so authorities must converge to (0.25, 0.5, 0.25)
    // under L1 normalization — and this fixture reaches the fixpoint in
    // one round, so 4 rounds must sit exactly on it.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)).toDF("u", "i")
    val (hubs, auths) = Graph.hits(edges, iters = 4)
    val a = auths.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(a(10L) - 0.25) < 1e-12)
    assert(math.abs(a(11L) - 0.50) < 1e-12)
    assert(math.abs(a(12L) - 0.25) < 1e-12)
    val h = hubs.collect().map(_.getDouble(1))
    assert(math.abs(h.sum - 1.0) < 1e-12, "hub mass must be 1")
    assert(h.forall(x => math.abs(x - 0.5) < 1e-12), "symmetric hubs must tie")
    // real-graph run: top-20 authorities, mass <= 1, deterministic repeat
    val out1 = Graph.q446Hits.fn(spark, sf).collect()
    val out2 = Graph.q446Hits.fn(spark, sf).collect()
    assert(out1.nonEmpty && out1.length <= 20)
    assert(out1.map(_.toString).toSeq === out2.map(_.toString).toSeq)
  }

  test("triangle count: compact-forward join equals brute-force closed forms on fixtures") {
    import spark.implicits._
    // triangle + pendant edge: {1,2,3} closed, 3-4 open => exactly 1 triangle
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val one = tri.as("e1").join(tri.as("e2"), $"e1.b" === $"e2.a")
      .join(tri.as("e3"), $"e3.a" === $"e1.a" && $"e3.b" === $"e2.b")
      .count()
    assert(one === 1L)
    // K4 has C(4,3)=4 triangles
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("a", "b")
    val four = k4.as("e1").join(k4.as("e2"), $"e1.b" === $"e2.a")
      .join(k4.as("e3"), $"e3.a" === $"e1.a" && $"e3.b" === $"e2.b")
      .count()
    assert(four === 4L)
  }
}
