package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** SURVEY.md §5.3 — Spark-backed algebraic laws (each case is a job, so a
  * handful of generated cases per law rather than ScalaCheck's default 100). */
class PropertiesSparkSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("filter-join commutation: σ_p(A ⋈ B) == σ_p(A) ⋈ B for p over A") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    for (threshold <- Seq(5.0, 17.0, 42.0, 49.0)) {
      val late = li.join(o, $"l_orderkey" === $"o_orderkey")
        .filter($"l_quantity" > threshold).count()
      val early = li.filter($"l_quantity" > threshold)
        .join(o, $"l_orderkey" === $"o_orderkey").count()
      assert(late === early, s"threshold=$threshold")
    }
  }

  test("union count law and union-dedup law") {
    import spark.implicits._
    val c = Tables.customer(spark, sf)
    for (seg <- Seq("AUTOMOBILE", "BUILDING", "MACHINERY")) {
      val a = c.filter($"c_mktsegment" === seg)
      val b = c.filter($"c_acctbal" > 2500)
      assert(a.union(b).count() === a.count() + b.count())
      assert(a.union(a).distinct().count() === a.distinct().count())
    }
  }

  test("dedup idempotence: dropDuplicates ∘ dropDuplicates == dropDuplicates") {
    val docs = Tables.documents(spark, sf)
    for (cols <- Seq(Seq("lang"), Seq("lang", "source"), Seq("text"))) {
      val once = docs.dropDuplicates(cols).count()
      val twice = docs.dropDuplicates(cols).dropDuplicates(cols).count()
      assert(once === twice, s"cols=$cols")
    }
  }

  test("randomSplit partitions are disjoint and exhaustive for varied weights") {
    import spark.implicits._
    val o = Tables.orders(spark, sf)
    val total = o.count()
    for ((w, seed) <- Seq((Array(0.5, 0.5), 1L), (Array(0.9, 0.1), 7L), (Array(0.3, 0.3, 0.4), 13L))) {
      val parts = o.randomSplit(w, seed)
      assert(parts.map(_.count()).sum === total, s"weights=${w.toSeq}")
      for (i <- parts.indices; j <- parts.indices if i < j)
        assert(parts(i).select($"o_orderkey").intersect(parts(j).select($"o_orderkey")).count() === 0)
    }
  }

  test("exact dedup keeps exactly one representative per content key") {
    import spark.implicits._
    val result = graft.llm.Dedup.q44DedupExact.fn(spark, sf)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(result.agg(sum($"n_copies")).head.getLong(0) === totalDocs)
    assert(result.select($"keep_id").distinct().count() === result.count())
  }
}
