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

  def all: Seq[GraftQuery] = Seq(q78TypedAgg)
}
