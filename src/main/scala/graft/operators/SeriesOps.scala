package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** Temporal-interval and sequential-series operators (SURVEY.md §2's
  * round-9 additions): interval UNION (coverage) via the sweep-line
  * islands merge, Brown's double exponential smoothing (the trend-aware
  * sibling of q436's SES), and Page–Hinkley sequential drift detection
  * (the changepoint monitor streaming pipelines run over daily census
  * series).
  *
  * All three are INTEGER-exact end to end (day arithmetic, cents,
  * fixed-point 2ᵏ smoothing weights, ppm scaling), so every query is
  * strict-oracle'd — no float summation-order risk at any SF or
  * partition count (the q436/q467 discipline). */
object SeriesOps {

  /** INTERVAL UNION (coverage) — the temporal-DB "how much time does this
    * set of possibly-overlapping intervals actually cover" operator
    * (union length / utilization), distinct from q161's consecutive-day
    * islands (calendar gaps) and q187's interval×interval overlap join:
    * here intervals have data-dependent LENGTHS and must be MERGED.
    * Intervals are synthesized deterministically from `orders` (start =
    * o_orderdate, length = 30 + o_orderkey % 180 days, half-open [s, e)),
    * so both engines derive identical inputs. Sweep per customer in
    * start order: an interval starts a new island iff its start lies
    * strictly after the running max of prior ends (touching intervals
    * merge); island id = running count of starts; coverage per island =
    * max(end) − min(start). Output per customer: orders, islands, union
    * days, duplicated (overlap) days, and idle gap days inside the span.
    *
    * 100 TB plan: both windows partition on c_custkey (millions of
    * shuffle keys, no global sort anywhere); rows per key are bounded by
    * per-customer order frequency, not corpus size. The island agg and
    * final agg reuse the same customer partitioning (one shuffle total),
    * and everything after the scan is integer day arithmetic. A key with
    * pathological row counts would take q70's salting on the ISLAND agg
    * (islands compose across salt ranges only after a merge pass) — at
    * TPC-H order rates the per-key bound holds by construction. */
  val q471IntervalUnion: GraftQuery = GraftQuery.oracled(
    "q471_interval_union",
    """WITH iv AS (
      |  SELECT o_custkey AS c,
      |         date_diff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE)) AS s,
      |         date_diff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE))
      |           + 30 + o_orderkey % 180 AS e,
      |         o_orderkey AS k
      |  FROM orders),
      |m AS (SELECT c, s, e, k,
      |             max(e) OVER (PARTITION BY c ORDER BY s, k
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      |      FROM iv),
      |fl AS (SELECT c, s, e, k,
      |              CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni,
      |              e - s AS len
      |       FROM m),
      |isl AS (SELECT c, s, e, len,
      |               sum(ni) OVER (PARTITION BY c ORDER BY s, k
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
      |        FROM fl),
      |pc AS (SELECT c, iid,
      |              CAST(max(e) - min(s) AS BIGINT) AS cov,
      |              CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(len) AS BIGINT) AS raw,
      |              CAST(min(s) AS BIGINT) AS is_, CAST(max(e) AS BIGINT) AS ie
      |       FROM isl GROUP BY 1, 2)
      |SELECT c AS c_custkey,
      |       CAST(sum(n) AS BIGINT) AS n_orders,
      |       CAST(count(*) AS BIGINT) AS n_islands,
      |       CAST(sum(cov) AS BIGINT) AS union_days,
      |       CAST(sum(raw) - sum(cov) AS BIGINT) AS dup_days,
      |       CAST(max(ie) - min(is_) - sum(cov) AS BIGINT) AS gap_days
      |FROM pc GROUP BY c
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val iv = Tables.orders(spark, dir).select(
      $"o_custkey".as("c"),
      datediff(to_date($"o_orderdate"), to_date(lit("1994-01-01"))).cast("long").as("s"),
      (datediff(to_date($"o_orderdate"), to_date(lit("1994-01-01"))).cast("long")
        + 30 + $"o_orderkey" % 180).as("e"),
      $"o_orderkey".as("k"))
    val byStart = Window.partitionBy($"c").orderBy($"s", $"k")
    val fl = iv
      .withColumn("pme", max($"e").over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni", when($"pme".isNull || $"s" > $"pme", 1L).otherwise(0L))
      .withColumn("len", $"e" - $"s")
    val isl = fl.withColumn("iid",
      sum($"ni").over(byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pc = isl.groupBy($"c", $"iid")
      .agg((max($"e") - min($"s")).cast("long").as("cov"),
        count(lit(1)).cast("long").as("n"),
        sum($"len").cast("long").as("raw"),
        min($"s").cast("long").as("is_"), max($"e").cast("long").as("ie"))
    pc.groupBy($"c".as("c_custkey"))
      .agg(sum($"n").cast("long").as("n_orders"),
        count(lit(1)).cast("long").as("n_islands"),
        sum($"cov").cast("long").as("union_days"),
        (sum($"raw") - sum($"cov")).cast("long").as("dup_days"),
        (max($"ie") - min($"is_") - sum($"cov")).cast("long").as("gap_days"))
      .orderBy($"c_custkey")
  }

  /** BROWN'S DOUBLE EXPONENTIAL SMOOTHING backtest — the trend-aware
    * forecaster q436's SES can't be (SES lags any drifting series by
    * design; Brown 1963 recovers the trend from the smoothed-of-smoothed
    * gap: level a = 2S′ − S″, trend b = (α/(1−α))(S′ − S″)). Same daily
    * cents-per-priority series, same fixed-point discipline as q436:
    * α = 1/2 as weights 2^(20−lag) over a 21-term truncated window
    * (tail mass < 5·10⁻⁷ of the weight sum), integer `div` by 2²¹−1,
    * so S′, S″, and the h=1 forecast 3S′−2S″ are exact BIGINTs on both
    * engines. Reported per priority against the naive (last-value)
    * forecast with the same n_eval/MAE/MASE shape as q436 — the two
    * rows read side by side as the SES-vs-DES model comparison.
    *
    * 100 TB plan: the row-scale stage is the daily census (map-side
    * combined, calendar × priority sized output); both convolutions are
    * 21× EXPLODES of the census re-aggregated on (pri, target-index) —
    * each source day scatters its 21 weighted contributions and a
    * map-side-combinable hash-agg folds them, so there is no join at
    * all and no days²-per-key pairing (the first formulation
    * hash-joined the census on `pri` alone — 5 keys — and benched
    * 18 s at sf0.1 from the quadratic per-key residual; this shape is
    * 0.9 s). Phantom targets past each series' end never reach the
    * output: the forecast join keys them away, and a phantom S′ index
    * can only feed phantom S″ indices (contributors sit at or below
    * their target). */
  val q474BrownDes: GraftQuery = GraftQuery.oracled(
    "q474_brown_des",
    """WITH daily AS (
      |  SELECT o_orderpriority AS pri, o_orderdate AS d,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |idx AS (SELECT pri, cents,
      |               row_number() OVER (PARTITION BY pri ORDER BY d) AS i
      |        FROM daily),
      |s1 AS (SELECT a.pri, a.i,
      |              CAST(sum(b.cents * (CAST(1 AS BIGINT) << CAST(20 - (a.i - b.i) AS INTEGER)))
      |                   // 2097151 AS BIGINT) AS s1
      |       FROM idx a JOIN idx b
      |         ON a.pri = b.pri AND b.i >= a.i - 20 AND b.i <= a.i
      |       WHERE a.i > 20
      |       GROUP BY a.pri, a.i),
      |s2 AS (SELECT a.pri, a.i, a.s1,
      |              CAST(sum(b.s1 * (CAST(1 AS BIGINT) << CAST(20 - (a.i - b.i) AS INTEGER)))
      |                   // 2097151 AS BIGINT) AS s2
      |       FROM s1 a JOIN s1 b
      |         ON a.pri = b.pri AND b.i >= a.i - 20 AND b.i <= a.i
      |       WHERE a.i > 40
      |       GROUP BY a.pri, a.i, a.s1),
      |fc AS (SELECT n.pri, n.i, n.cents,
      |              3 * p.s1 - 2 * p.s2 AS des_fc,
      |              l.cents AS naive_fc
      |       FROM idx n
      |       JOIN s2 p ON p.pri = n.pri AND p.i = n.i - 1
      |       JOIN idx l ON l.pri = n.pri AND l.i = n.i - 1)
      |SELECT pri, CAST(count(*) AS BIGINT) AS n_eval,
      |       CAST((100 * sum(abs(cents - des_fc))) // count(*) AS BIGINT) AS des_mae_x100,
      |       CAST((100 * sum(abs(cents - naive_fc))) // count(*) AS BIGINT) AS naive_mae_x100,
      |       CAST((1000000 * sum(abs(cents - des_fc))) // sum(abs(cents - naive_fc)) AS BIGINT)
      |         AS mase_ppm
      |FROM fc GROUP BY pri ORDER BY pri""") { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderdate".as("d"))
      .agg(sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).cast("long").as("cents"))
    val idx = daily
      .withColumn("i", row_number().over(Window.partitionBy($"pri").orderBy($"d")))
      .select($"pri", $"i", $"cents")
    // Scatter-add convolution: each (pri, i, v) contributes v·2^(20−d) to
    // target i+d for d ∈ [0,20]; a hash-agg on (pri, target) folds the 21
    // weighted contributions. Targets ≥ minFull have all 21 contributors
    // (i = t−d ≥ 1); targets past the series end are phantoms the forecast
    // join filters out.
    def smooth(in: org.apache.spark.sql.DataFrame, vcol: String, out: String,
        minFull: Int) =
      in.withColumn("dd", explode(sequence(lit(0), lit(20))))
        .select($"pri", ($"i" + $"dd").as("i"),
          (col(vcol) * expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - dd AS INT))")).as("w"))
        .groupBy($"pri", $"i")
        .agg(expr("sum(w) div 2097151").cast("long").as(out))
        .filter($"i" > minFull)
    val s1 = smooth(idx, "cents", "s1", 20)
    val s2 = smooth(s1, "s1", "s2", 40)
      .join(s1, Seq("pri", "i"))
      .select($"pri", $"i", $"s1", $"s2")
    val n = idx.as("n"); val p = s2.as("p"); val l = idx.as("l")
    val fc = n
      .join(p, $"p.pri" === $"n.pri" && $"p.i" === $"n.i" - 1)
      .join(l, $"l.pri" === $"n.pri" && $"l.i" === $"n.i" - 1)
      .select($"n.pri".as("pri"), $"n.cents".as("cents"),
        (lit(3) * $"p.s1" - lit(2) * $"p.s2").as("des_fc"),
        $"l.cents".as("naive_fc"))
    fc.groupBy($"pri")
      .agg(count(lit(1)).cast("long").as("n_eval"),
        expr("(100 * sum(abs(cents - des_fc))) div count(1)").cast("long")
          .as("des_mae_x100"),
        expr("(100 * sum(abs(cents - naive_fc))) div count(1)").cast("long")
          .as("naive_mae_x100"),
        expr("(1000000 * sum(abs(cents - des_fc))) div sum(abs(cents - naive_fc))")
          .cast("long").as("mase_ppm"))
      .orderBy($"pri")
  }

  /** PAGE–HINKLEY sequential drift detector (Page 1954; Hinkley 1971;
    * the default concept-drift monitor in stream-mining stacks) over the
    * daily order-count series per priority: mₜ = Σ (xⱼ − x̄ⱼ − δ) with
    * the running mean x̄ⱼ, and PHₜ = mₜ − min_{j≤t} mⱼ alarms when the
    * series runs persistently above its historical mean — CUSUM's
    * one-sided cousin, distinct from q325's EWMA control chart (fixed
    * smoothing, band test) and q244's seasonal decompose. δ = 0 and all
    * terms ×10⁶ with floor-div running means keep every quantity an
    * exact BIGINT on both engines (the x̄ⱼ division is the only
    * non-integer step, pinned by the same `div` floor both sides).
    * Output per priority: days observed, peak PH (scaled), the day the
    * peak occurred (earliest on ties), and alarms above λ = 20·10⁶.
    *
    * 100 TB plan: the row-scale stage is the daily census (map-side
    * combine to calendar × priority rows); the four running windows all
    * ride the SAME priority-keyed daily table — per-key rows are
    * calendar-bounded (≤ a few thousand), the bounded-census window
    * class (q436), never a corpus-scale window. */
  val q475PageHinkley: GraftQuery = GraftQuery.oracled(
    "q475_page_hinkley",
    """WITH daily AS (
      |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1, 2),
      |w AS (SELECT pri, d, x,
      |             sum(x) OVER (PARTITION BY pri ORDER BY d
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc,
      |             row_number() OVER (PARTITION BY pri ORDER BY d) AS i
      |      FROM daily),
      |t AS (SELECT pri, d, 1000000 * x - (1000000 * sc) // i AS term FROM w),
      |m AS (SELECT pri, d, sum(term) OVER (PARTITION BY pri ORDER BY d
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |      FROM t),
      |ph AS (SELECT pri, d,
      |              m - min(m) OVER (PARTITION BY pri ORDER BY d
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
      |       FROM m),
      |pk AS (SELECT pri, d, ph,
      |              row_number() OVER (PARTITION BY pri ORDER BY ph DESC, d) AS rn
      |       FROM ph)
      |SELECT pri,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(max(ph) AS BIGINT) AS max_ph,
      |       max(CASE WHEN rn = 1 THEN d END) AS peak_day,
      |       CAST(sum(CASE WHEN ph > 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
      |FROM pk
      |GROUP BY pri
      |ORDER BY pri""") { (spark, dir) =>
    import spark.implicits._
    val byDay = Window.partitionBy($"pri").orderBy($"d")
    val run = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority".as("pri"), to_date($"o_orderdate").as("d"))
      .agg(count(lit(1)).cast("long").as("x"))
    val ph = daily
      .withColumn("sc", sum($"x").over(run))
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("term", lit(1000000L) * $"x" - expr("(1000000 * sc) div i"))
      .withColumn("m", sum($"term").over(run))
      .withColumn("ph", $"m" - min($"m").over(run))
    val pk = ph.withColumn("rn",
      row_number().over(Window.partitionBy($"pri").orderBy($"ph".desc, $"d")))
    pk.groupBy($"pri")
      .agg(count(lit(1)).cast("long").as("n_days"),
        max($"ph").cast("long").as("max_ph"),
        max(when($"rn" === 1, $"d")).as("peak_day"),
        sum(when($"ph" > 20000000L, 1L).otherwise(0L)).cast("long").as("n_alarms"))
      .orderBy($"pri")
  }

  /** HAAR WAVELET ENERGY PYRAMID (Haar 1910; the Mallat 1989 pyramid with
    * the UNNORMALIZED integer filter) over the daily dollars-per-priority
    * series: four levels of pairwise (sum, difference) — detail dₖ[i] =
    * a[2i] − a[2i+1], approximation aₖ[i] = a[2i] + a[2i+1], trailing odd
    * samples dropped per level — reporting per (priority, level) the
    * coefficient count and detail energy Σd². The energy split by scale
    * is the classic multi-resolution variance screen (which timescale
    * carries the volatility); keeping the filter unnormalized (integer
    * ±1 taps, no 1/√2) makes every coefficient an exact BIGINT, so the
    * whole pyramid is strict-oracle'd. Dollar (not cent) units keep
    * Σd² under 2⁶³ through sf0.1 with ~100× headroom; at larger corpora
    * rescale the unit — the overflow surface is this one census knob.
    *
    * 100 TB plan: the row-scale stage is the daily census (map-side
    * combined); each pyramid level is one (pri, i div 2) hash-agg on the
    * CALENDAR-sized coefficient table — log₂(days) rounds of trivially
    * combinable aggregation, never a window and never a join. */
  val q478HaarEnergy: GraftQuery = GraftQuery.oracled(
    "q478_haar_energy",
    """WITH daily AS (
      |  SELECT o_orderpriority AS pri, o_orderdate AS d,
      |         CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1, 2),
      |l0 AS (SELECT pri, row_number() OVER (PARTITION BY pri ORDER BY d) - 1 AS i, v
      |       FROM daily),
      |p1 AS (SELECT pri, i // 2 AS i,
      |              CAST(sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS det,
      |              CAST(sum(v) AS BIGINT) AS app
      |       FROM l0 GROUP BY 1, 2 HAVING count(*) = 2),
      |p2 AS (SELECT pri, i // 2 AS i,
      |              CAST(sum(CASE WHEN i % 2 = 0 THEN app ELSE -app END) AS BIGINT) AS det,
      |              CAST(sum(app) AS BIGINT) AS app
      |       FROM p1 GROUP BY 1, 2 HAVING count(*) = 2),
      |p3 AS (SELECT pri, i // 2 AS i,
      |              CAST(sum(CASE WHEN i % 2 = 0 THEN app ELSE -app END) AS BIGINT) AS det,
      |              CAST(sum(app) AS BIGINT) AS app
      |       FROM p2 GROUP BY 1, 2 HAVING count(*) = 2),
      |p4 AS (SELECT pri, i // 2 AS i,
      |              CAST(sum(CASE WHEN i % 2 = 0 THEN app ELSE -app END) AS BIGINT) AS det,
      |              CAST(sum(app) AS BIGINT) AS app
      |       FROM p3 GROUP BY 1, 2 HAVING count(*) = 2)
      |SELECT pri, CAST(1 AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
      |       CAST(sum(det * det) AS BIGINT) AS energy FROM p1 GROUP BY pri
      |UNION ALL
      |SELECT pri, 2, CAST(count(*) AS BIGINT), CAST(sum(det * det) AS BIGINT) FROM p2 GROUP BY pri
      |UNION ALL
      |SELECT pri, 3, CAST(count(*) AS BIGINT), CAST(sum(det * det) AS BIGINT) FROM p3 GROUP BY pri
      |UNION ALL
      |SELECT pri, 4, CAST(count(*) AS BIGINT), CAST(sum(det * det) AS BIGINT) FROM p4 GROUP BY pri
      |ORDER BY pri, level""") { (spark, dir) =>
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority".as("pri"), $"o_orderdate".as("d"))
      .agg(sum(floor($"o_totalprice" + 0.5).cast("long")).cast("long").as("v"))
    val l0 = daily
      .withColumn("i",
        row_number().over(Window.partitionBy($"pri").orderBy($"d")).cast("long") - 1)
      .select($"pri", $"i", $"v".as("app"))
      .localCheckpoint() // calendar-sized; read by all four pyramid levels
    def level(prev: org.apache.spark.sql.DataFrame) =
      prev.groupBy($"pri", expr("i div 2").as("i2"))
        .agg(sum(when($"i" % 2 === 0, $"app").otherwise(-$"app")).cast("long").as("det"),
          sum($"app").cast("long").as("app2"),
          count(lit(1)).as("c"))
        .filter($"c" === 2)
        .select($"pri", $"i2".as("i"), $"det", $"app2".as("app"))
    var cur = l0
    val energies = (1 to 4).map { k =>
      cur = level(cur)
      cur.groupBy($"pri")
        .agg(count(lit(1)).cast("long").as("n_coeffs"),
          sum($"det" * $"det").cast("long").as("energy"))
        .select($"pri", lit(k.toLong).as("level"), $"n_coeffs", $"energy")
    }
    energies.reduce(_ union _).orderBy($"pri", $"level")
  }

  def all: Seq[GraftQuery] =
    Seq(q471IntervalUnion, q474BrownDes, q475PageHinkley, q478HaarEnergy)
}
