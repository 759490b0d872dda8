package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.engine.GraftQuery
import graft.operators.RelationalCore.stat
import graft.sources.Tables

/** SURVEY.md §2.4/§2.11 — custom typed UDAF surface: a Welford/Chan
  * streaming-variance `Aggregator`, the canonical merge-able statistical
  * accumulator.
  *
  * Scale shape: the buffer is 24 bytes regardless of group size; partial
  * buffers combine map-side and merge associatively across partitions —
  * exactly the contract a 1000-executor `treeAggregate` needs. Verified
  * against the engine-independent `var_samp` oracle. */
object Aggregators {

  final case class VarBuf(n: Long, mean: Double, m2: Double)

  /** Welford update + Chan parallel merge for sample variance. */
  object WelfordVariance extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      VarBuf(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        VarBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    override def finish(r: VarBuf): Double =
      if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Custom UDAF vs built-in: Welford variance of extended price per
    * returnflag, checked against `var_samp` (both in-engine and in the
    * DuckDB oracle). */
  val q69CustomUdaf: GraftQuery = GraftQuery.oracled(
    "q69_custom_udaf_variance",
    """SELECT l_returnflag,
      |       round(var_samp(l_extendedprice), 3) AS welford_var,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    val welford = udaf(WelfordVariance)
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(welford($"l_extendedprice"), 3).as("welford_var"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  def all: Seq[GraftQuery] = Seq(q69CustomUdaf)
}
