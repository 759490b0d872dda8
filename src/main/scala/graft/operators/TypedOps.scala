package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §1.1/§2.11 — the typed `Dataset[T]` surface: case-class
  * encoders, `groupByKey`, and a typed `Aggregator` used as a TypedColumn.
  * Unlike `mapGroups` (which shuffles whole rows), a typed Aggregator keeps
  * map-side partial aggregation — the scale-correct typed reduction. */
object TypedOps {

  final case class Line(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)
  final case class RevStats(sum_qty: Double, sum_price: Double, n: Long)

  /** Typed revenue statistics accumulator (mergeable, 24-byte buffer). */
  object RevenueAgg extends Aggregator[Line, RevStats, RevStats] {
    override def zero: RevStats = RevStats(0.0, 0.0, 0L)
    override def reduce(b: RevStats, l: Line): RevStats =
      RevStats(b.sum_qty + l.l_quantity, b.sum_price + l.l_extendedprice, b.n + 1)
    override def merge(a: RevStats, b: RevStats): RevStats =
      RevStats(a.sum_qty + b.sum_qty, a.sum_price + b.sum_price, a.n + b.n)
    override def finish(r: RevStats): RevStats = r
    override def bufferEncoder: Encoder[RevStats] = Encoders.product[RevStats]
    override def outputEncoder: Encoder[RevStats] = Encoders.product[RevStats]
  }

  /** Typed pipeline: `as[Line]` → `groupByKey` → typed Aggregator column —
    * compile-time field checks end to end, oracle'd like any relational agg. */
  val q78TypedAgg: GraftQuery = GraftQuery.oracled(
    "q78_typed_agg",
    """SELECT l_returnflag,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[Line]
      .groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("stats"))
      .toDF("l_returnflag", "stats")
      .select($"l_returnflag",
        RelationalCore.money($"stats.sum_qty").as("sum_qty"),
        RelationalCore.money($"stats.sum_price").as("sum_price"),
        $"stats.n".as("n"))
      .orderBy($"l_returnflag")
  }

  final case class Ev(user_id: Long, event_id: Long, epoch_us: Long)
  final case class Kept(user_id: Long, event_id: Long, epoch_us: Long, kept_rank: Long)

  /** GREEDY THROTTLE DEDUP — "at most one purchase notification per user
    * per 24 h": keep an event iff it is ≥ 24 h after the LAST KEPT event
    * of that user. This is a chain-dependent scan (each decision depends
    * on the previous KEPT row, not the previous row), which no bounded
    * window frame or sessionization can express — session-gap grouping
    * gives a DIFFERENT answer on streaks (events at h0/h20/h40: throttle
    * keeps h0+h40, gap-sessions keep only h0). The right Spark shape is
    * the typed escape hatch: `groupByKey(user).flatMapGroups` with an
    * in-memory per-user sort + single greedy walk.
    *
    * 100 TB plan: ONE shuffle by user; per-group state is the user's own
    * event timestamps (bounded by per-user activity, thousands — the
    * documented bound; for pathological users chunk by month first: the
    * throttle chain only crosses a boundary through its last kept row).
    *
    * STRICT since r8 (formerly rows-only, gated on Round6Spec's reference
    * walk — which stays): the greedy chain IS SQL-expressible as a
    * recursive-CTE replay (the q430 WordPiece pattern) — the working set
    * carries each user's LAST KEPT row, and every round advances it to
    * that user's earliest event ≥ 24 h later (row_number over the
    * candidate set, tie-broken by event_id exactly like the typed walk's
    * sort). Users whose chain is exhausted simply drop out of the
    * frontier. */
  val q324ThrottleDedup: GraftQuery = GraftQuery.oracled(
    "q324_throttle_dedup",
    """WITH RECURSIVE
      |p AS (SELECT user_id, event_id,
      |             epoch_us(date_trunc('microseconds', ts)) AS us
      |      FROM events WHERE event_type = 'purchase'),
      |k AS (
      |  SELECT user_id, event_id, us, CAST(1 AS BIGINT) AS kept_rank
      |  FROM (SELECT user_id, event_id, us,
      |               row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      |        FROM p)
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT user_id, event_id, us, kept_rank + 1 FROM (
      |    SELECT p.user_id, p.event_id, p.us, k.kept_rank,
      |           row_number() OVER (PARTITION BY p.user_id ORDER BY p.us, p.event_id) AS rn
      |    FROM k JOIN p ON p.user_id = k.user_id AND p.us >= k.us + 86400000000
      |  ) WHERE rn = 1
      |)
      |SELECT user_id, event_id, us AS epoch_us, kept_rank
      |FROM k ORDER BY user_id, kept_rank""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = 24L * 3600 * 1000000 // 24 h in µs
    Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts").as("epoch_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.epoch_us, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer[Kept]()
        var lastKept = Long.MinValue
        var rank = 0
        for (e <- evs) {
          if (lastKept == Long.MinValue || e.epoch_us >= lastKept + W) {
            rank += 1
            out += Kept(uid, e.event_id, e.epoch_us, rank)
            lastKept = e.epoch_us
          }
        }
        out.iterator
      }
      .toDF()
      .orderBy($"user_id", $"kept_rank")
  }

  def all: Seq[GraftQuery] = Seq(q78TypedAgg, q324ThrottleDedup)
}
