package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Structural invariants for the round-6 operators — laws the oracle's
  * value-hash can confirm but not EXPLAIN; each is the property that makes
  * the operator correct by construction (SURVEY.md §5). */
class Round6Spec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("FIFO allocation law: matched quantity is exactly min(supply, demand) per part") {
    import spark.implicits._
    // Interval intersection of two prefix-sum partitions of the same line
    // covers [0, min(totals)) exactly once — so alloc_qty must equal
    // least(receipt_qty, issue_qty) for EVERY part, and the shortfall is
    // the positive part of the difference.
    val bad = EventAnalytics.q302FifoAllocation.fn(spark, sf)
      .filter($"alloc_qty" =!= least($"receipt_qty", $"issue_qty") ||
        $"short_qty" =!= greatest($"issue_qty" - $"receipt_qty", lit(0L)))
    assert(bad.count() === 0)
  }

  test("apportionment: seats sum exactly to the budget and differ from floors by the leftover") {
    import spark.implicits._
    val r = Aggregates.q310Apportionment.fn(spark, sf)
      .agg(sum($"seats").as("s"), sum($"extra").as("e"),
        sum($"seats" - $"floor_seats").as("d"))
      .collect()(0)
    assert(r.getLong(0) === 1000L, "seats must sum to the budget")
    assert(r.getLong(1) === r.getLong(2), "every extra seat is one unit above floor")
  }

  test("BH-FDR: the rejected set is exactly a prefix of the p-value ranking") {
    import spark.implicits._
    val rows = Eda.q305BhFdr.fn(spark, sf)
      .select($"p_rank", $"rejected").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val k = rows.count(_._2 == 1)
    assert(rows.takeWhile(_._2 == 1).length === k,
      "rejections must form a rank prefix (step-up property)")
  }

  test("local clustering coefficient is a valid fraction and deg-2 vertices are 0-or-1") {
    import spark.implicits._
    val df = Graph.q307ClusteringCoeff.fn(spark, sf).cache()
    assert(df.filter($"lcc" < 0 || $"lcc" > 1).count() === 0)
    // each triangle contributes exactly 3 member slots
    val tri = Graph.q154Triangles.fn(spark, sf).select($"n_triangles").collect()(0).getLong(0)
    val slots = df.agg(sum($"n_tri")).collect()(0).getLong(0)
    assert(slots === 3 * tri, s"member slots $slots != 3 x $tri triangles")
    df.unpersist()
  }

  test("EB shrinkage pulls every rate toward the prior mean, never past it") {
    import spark.implicits._
    val rows = Eda.q303EbShrinkage.fn(spark, sf)
      .select($"rate_raw", $"rate_shrunk").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val m = rows.map(_._1).sum / rows.length // ≈ prior mean (MoM uses the same average)
    for ((raw, shrunk) <- rows)
      assert((shrunk >= raw - 1e-9 && shrunk <= m + 1e-2) ||
        (shrunk <= raw + 1e-9 && shrunk >= m - 1e-2),
        s"shrunk $shrunk not between raw $raw and prior ~$m")
  }

  test("inclusion mining: declared TPC-H FKs score 1.0, the spurious pair does not") {
    import spark.implicits._
    val rows = Profiler.q313InclusionDeps.fn(spark, sf)
      .select($"candidate", $"is_inclusion").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("lineitem.l_orderkey->orders.o_orderkey") === 1)
    assert(rows("orders.o_custkey->customer.c_custkey") === 1)
    assert(rows("customer.c_nationkey->nation.n_nationkey") === 1)
    assert(rows("part.p_size->nation.n_nationkey") === 0,
      "the spurious candidate must be rejected")
  }

  test("expectations suite: the clean TPC-H corpus passes every declared check") {
    import spark.implicits._
    val bad = Profiler.q316Expectations.fn(spark, sf).filter($"n_violations" > 0)
    assert(bad.count() === 0)
  }

  test("frame sampling: stride-5 indices, offsets consistent, full frames 100 bytes") {
    import spark.implicits._
    val df = graft.llm.Multimodal.q317FrameSample.fn(spark, sf).cache()
    assert(df.filter($"frame_idx" % 5 =!= 0).count() === 0)
    assert(df.filter($"frame_offset" =!= $"frame_idx" * 100).count() === 0)
    assert(df.filter($"frame_bytes" > 100).count() === 0)
    df.unpersist()
  }

  test("throttle dedup matches an independent greedy reference walk") {
    import spark.implicits._
    val got = TypedOps.q324ThrottleDedup.fn(spark, sf)
      .select($"user_id", $"event_id", $"kept_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
    val raw = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val W = 24L * 3600 * 1000000
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      var last = Long.MinValue
      var rank = 0
      evs.sortBy(e => (e._3, e._2)).flatMap { case (_, eid, us) =>
        if (last == Long.MinValue || us >= last + W) {
          last = us; rank += 1; Some((uid, eid, rank))
        } else None
      }
    }.toSet
    assert(got === expected)
    // and throttling really differs from gap-sessionization on streaks:
    // consecutive kept events are >= W apart, but a kept event may follow
    // a DROPPED one by less than W
    assert(got.nonEmpty)
  }

  test("waterfill: allocations sum exactly to the budget and fill in quality order") {
    import spark.implicits._
    val rows = graft.llm.Curation.q323MixWaterfill.fn(spark, sf)
      .select($"n_tokens", $"quality", $"alloc_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val budget = rows.map(_._1).sum / 2
    assert(rows.map(_._3).sum === budget, "allocations must exhaust the budget exactly")
    // sorted by quality desc: full, full, ..., partial, zero, zero
    val byQ = rows.sortBy(-_._2).map { case (n, _, a) => if (a == n) "F" else if (a == 0) "Z" else "P" }
    assert("^F*P?Z*$".r.matches(byQ.mkString), s"fill pattern ${byQ.mkString} not monotone")
  }

  test("Markov removal effect: hand-computable chain fixture and probability laws") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1,2: view -> click -> purchase; user 3: view -> NULL.
    // Chain: START->view (p=1), view->{click 2/3, NULL 1/3}, click->CONV (p=1).
    // v0 = 2/3. Remove click => conversion 0 => effect(click)=1.
    // Remove view => START->view redirected to NULL => conversion 0 => effect(view)=1.
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "purchase"),
      (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"), (2L, ts(3), 6L, "purchase"),
      (3L, ts(1), 7L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.markovRemoval(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got.map(_._1) === List("click", "view"))
    assert(got.forall(_._2 === 1000000L), s"both touches are necessary: $got")
    assert(got.map(_._3).sum === 1000000L, "shares must sum to 1e6 ppm")
    // real corpus: effects are ppm probabilities and shares are a partition
    val corpus = EventAnalytics.q326MarkovAttribution.fn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(corpus.forall { case (e, _) => e >= 0L && e <= 1000000L })
    assert(corpus.map(_._2).sum <= 1000000L)
  }

  test("JL projection: mean pairwise distance distortion is bounded") {
    import spark.implicits._
    // JL with k=16 Rademacher planes preserves SQUARED distances in
    // expectation; per-pair distortion concentrates as exp(-k eps^2 / 8).
    // Gate the MEAN relative distortion over a deterministic pair sample.
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = graft.llm.Similarity.q327JlProjection.fn(spark, sf)
      .filter($"vec_id" < 40).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val ids = emb.keys.toSeq.sorted
    val pairs = for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = pairs.map { case (a, b) =>
      val orig = d2(emb(a), emb(b))
      val prj = d2(proj(a).toArray, proj(b).toArray)
      prj / orig
    }
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.6 && meanRatio < 1.4,
      s"mean squared-distance ratio $meanRatio outside [0.6, 1.4]")
  }

  test("resize plan: aspect-fit never exceeds the box and preserves orientation") {
    import spark.implicits._
    val df = graft.llm.Multimodal.q318ResizePlan.fn(spark, sf)
      .filter($"out_w".isNotNull).cache()
    assert(df.filter($"out_w" > 224 || $"out_h" > 224).count() === 0)
    assert(df.filter(($"width" >= $"height") =!= ($"out_w" >= $"out_h")).count() === 0)
    df.unpersist()
  }
}
