package graft.sources

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery

/** SURVEY.md §2.1/§4 — partitioned parquet layout: `partitionBy` on write,
  * Hive-style directory pruning on read. At 100 TB this is THE layout
  * decision: a filter on the partition column prunes directories before a
  * single row group is opened (`PartitionFilters` in the scan node —
  * asserted by PartitionedSinkSpec). */
object PartitionedSink {

  def writeDir(tag: String): String = {
    val p = java.nio.file.Paths.get("/tmp/graft-io", s"${tag}_${System.nanoTime()}")
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  /** Write orders partitioned by status, read back with a partition filter,
    * aggregate. The oracle computes the same from the unpartitioned table —
    * identical results prove the round-trip loses nothing. */
  val q83PartitionedWrite: GraftQuery = GraftQuery.oracled(
    "q83_partitioned_write",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders
      |WHERE o_orderstatus IN ('F', 'O')
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    import graft.operators.RelationalCore.money
    val out = writeDir("orders_part")
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    spark.read.parquet(out)
      .filter($"o_orderstatus".isin("F", "O")) // → PartitionFilters, dirs pruned
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), money(sum($"o_totalprice")).as("total"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  def all: Seq[GraftQuery] = Seq(q83PartitionedWrite)
}
