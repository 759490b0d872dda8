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

  /** Range-clustered layout for data skipping: `repartitionByRange` on the
    * query key + `sortWithinPartitions` before write gives each parquet file
    * a disjoint key range, so a selective range predicate touches O(1) files
    * and the untouched files' footer min/max stats skip their row groups
    * without reading data — the complement of q83's directory pruning, for
    * keys too high-cardinality to partitionBy. At 100 TB this is the
    * difference between a point lookup scanning one file and scanning all of
    * them. The layout invariant is asserted in-query: the 100-key range must
    * land in ≤2 of the ≥8 files (2, not 1 — a range may legitimately
    * straddle one file boundary). `repartitionByRange` samples partition
    * bounds, which is fine here because the frame is materialized ONCE by
    * the write (the multi-consumer nondeterminism that bans it in q97 does
    * not apply to write-once layouts). */
  val q131ClusteredWrite: GraftQuery = GraftQuery.oracled(
    "q131_clustered_write",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderkey BETWEEN 1000 AND 1099
      |ORDER BY o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    val out = writeDir("orders_clustered")
    Tables.orders(spark, dir)
      .repartitionByRange(8, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
      .write.mode("overwrite").parquet(out)
    val nTotal = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    val hit = spark.read.parquet(out).filter($"o_orderkey".between(1000, 1099))
    val nHit = hit.select(input_file_name()).distinct().count()
    require(nTotal >= 8 && nHit <= 2,
      s"clustered layout: range query touched $nHit of $nTotal files")
    hit.select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  def all: Seq[GraftQuery] = Seq(q83PartitionedWrite, q131ClusteredWrite)
}
