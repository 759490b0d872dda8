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

  /** Interleave the low 16 bits of two non-negative int columns into a
    * Z-order (Morton) key — pure built-in bit ops, fully inside
    * whole-stage codegen. Locality property: a file holding a contiguous
    * z range covers a bounded sub-RECTANGLE of (a, b) space, so parquet
    * min/max stats prune on BOTH dimensions. */
  def zorder16(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale a column onto the 0..255 grid given its min/max. Interleaving
    * RAW columns of unequal bit width degenerates: the wide column's high
    * bits own every high z bit and the curve collapses to single-column
    * clustering (measured: with 200 partkeys × 10 suppkeys the per-file
    * suppkey span stayed at 0.99 of range). Production Z-ORDER
    * (Delta/Iceberg) rank- or range-normalizes each column first for
    * exactly this reason. */
  def grid8(c: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(lit(255), floor((c - lo) * 256.0 / (hi - lo + 1))).cast("int")

  /** Z-order clustered write: lineitem laid out on the Morton interleave of
    * (l_partkey, l_suppkey), then a two-dimensional box query read back
    * with file-level pruning REQUIRED — the space-filling-curve layout
    * behind Delta/Iceberg Z-ORDER (Morton 1966). q131's range clustering
    * prunes one dimension and smears the other across every file; the
    * z-curve bounds each file in both.
    *
    * 100 TB plan: layout cost is one range repartition on the z key (a
    * shuffle you pay once at write time); every 2-D box query afterwards
    * skips row groups on both predicates. The requirement below asserts the
    * skip actually happens (≤ half the files touched), not just that the
    * values survive; PartitionedSinkSpec proves the per-file bounding-box
    * areas beat single-column clustering. */
  val q176ZorderWrite: GraftQuery = GraftQuery.oracled(
    "q176_zorder_write",
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem
      |WHERE l_partkey BETWEEN 16 AND 47 AND l_suppkey BETWEEN 2 AND 5
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    val out = writeDir("lineitem_zorder")
    val li = Tables.lineitem(spark, dir)
    val mm = li.agg(
      min($"l_partkey").as("p_lo"), max($"l_partkey").as("p_hi"),
      min($"l_suppkey").as("s_lo"), max($"l_suppkey").as("s_hi"))
    li.crossJoin(broadcast(mm))
      .withColumn("z", zorder16(
        grid8($"l_partkey", $"p_lo", $"p_hi"),
        grid8($"l_suppkey", $"s_lo", $"s_hi")))
      .repartitionByRange(16, $"z")
      .sortWithinPartitions($"z")
      .drop("z", "p_lo", "p_hi", "s_lo", "s_hi")
      .write.mode("overwrite").parquet(out)
    val nTotal = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    val hit = spark.read.parquet(out)
      .filter($"l_partkey".between(16, 47) && $"l_suppkey".between(2, 5))
    val nHit = hit.select(input_file_name()).distinct().count()
    require(nTotal >= 8 && nHit <= nTotal / 2,
      s"z-order layout: box query touched $nHit of $nTotal files")
    hit.groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum($"l_extendedprice"), 2).as("revenue"))
      .orderBy($"l_returnflag")
  }

  /** ROW-GROUP ZONE-MAP AUDIT — the footer statistics data skipping runs
    * on, surfaced as a table: orders are written ONCE, sorted by
    * o_orderkey into small row groups (parquet.block.size=32 KB), then the
    * engine reads the file's OWN footer via parquet-hadoop
    * (`ParquetFileReader.open(...).getFooter` — metadata only, zero data
    * pages) and emits per row group its row count, o_orderkey min/max,
    * null count, and whether the probe predicate `BETWEEN 3000 AND 3999`
    * could SKIP it (max < lo OR min > hi — the exact test a reader's
    * filter pushdown applies). The DuckDB oracle reads THE SAME FILE with
    * its independent `parquet_metadata()` parser, so a strict match is a
    * cross-IMPLEMENTATION proof of the footer reader (the q301
    * Jaro–Winkler discipline), not a recompute.
    *
    * 100 TB story: this table IS the skipping story — a sorted layout
    * turns a point/range predicate into "read 1 row group, skip the
    * rest", and this audit is how a platform verifies its layout actually
    * produces disjoint zones before betting a petabyte scan on it. */
  val q457RowgroupStats: GraftQuery = GraftQuery.oracled(
    "q457_rowgroup_stats",
    """SELECT CAST(row_group_id AS BIGINT) AS rg,
      |       CAST(row_group_num_rows AS BIGINT) AS n_rows,
      |       CAST(stats_min_value AS BIGINT) AS min_okey,
      |       CAST(stats_max_value AS BIGINT) AS max_okey,
      |       CAST(stats_null_count AS BIGINT) AS n_nulls,
      |       CAST(stats_max_value AS BIGINT) < 3000
      |         OR CAST(stats_min_value AS BIGINT) > 3999 AS skippable
      |FROM parquet_metadata('/tmp/graft-io/q457_rowgroups/*.parquet')
      |WHERE path_in_schema = 'o_orderkey'
      |ORDER BY rg""") { (spark, dir) =>
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val out = "/tmp/graft-io/q457_rowgroups"
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_orderkey")
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", "32768")
      .option("parquet.page.size", "8192")
      .parquet(out)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, conf))
    val rows = try {
      reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
        case (block, i) =>
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey").get
          val st = col.getStatistics
          (i.toLong, block.getRowCount,
            st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
            st.getNumNulls)
      }
    } finally reader.close()
    rows.toDF("rg", "n_rows", "min_okey", "max_okey", "n_nulls")
      .select($"rg", $"n_rows", $"min_okey", $"max_okey", $"n_nulls",
        ($"max_okey" < 3000 || $"min_okey" > 3999).as("skippable"))
      .orderBy($"rg")
  }

  /** SCAN-PARTITIONING KNOB AUDIT — `spark.sql.files.maxPartitionBytes`
    * is the lever that decides how many tasks read a file set (too big ⇒
    * no parallelism; too small ⇒ task-launch overhead swamps I/O), and
    * this query measures it empirically: the same lineitem scan is
    * counted at 64 KB / 1 MB / 128 MB settings and the emitted rows carry
    * the observed scan-task counts (FilePartitions via rdd.getNumPartitions,
    * evaluated EAGERLY under each setting, session state restored after —
    * NOT row-bearing partition ids: splits are byte ranges and only the
    * range owning a row group's midpoint produces rows, so a 1-row-group
    * file always has exactly one non-empty split no matter the budget).
    * rows-only (the counts are engine/layout-specific); Round9Spec pins
    * the monotone law (bigger budget ⇒ never more partitions) and that
    * the 64 KB setting actually splits the file.
    *
    * 100 TB story: with files.maxPartitionBytes=128 MB a 100 TB scan is
    * ~800k tasks; this audit is how a platform sanity-checks the knob
    * against its real file sizes before a big run (the
    * `spark.sql.shuffle.partitions` sibling is covered by the bench
    * harness config itself). */
  val q459ScanPartitioning: GraftQuery = GraftQuery.rowsOnly(
    "q459_scan_partitioning",
    doc = "observed scan-task counts for maxPartitionBytes in {64KB, 1MB, 128MB} on the lineitem scan") {
    (spark, dir) =>
    import spark.implicits._
    val key = "spark.sql.files.maxPartitionBytes"
    val costKey = "spark.sql.files.openCostInBytes"
    val prev = spark.conf.getOption(key)
    val prevCost = spark.conf.getOption(costKey)
    try {
      // openCostInBytes floors the split size (maxSplitBytes =
      // min(maxPartitionBytes, max(openCost, bytes/parallelism))) — the
      // audit drops it to 4 KB so the byte budget is what's measured
      spark.conf.set(costKey, "4096")
      val rows = Seq(64L * 1024, 1L << 20, 128L * 1024 * 1024).map { bytes =>
        spark.conf.set(key, bytes.toString)
        val n = Tables.lineitem(spark, dir).select($"l_orderkey")
          .rdd.getNumPartitions.toLong
        (bytes, n)
      }
      rows.toDF("max_partition_bytes", "n_scan_partitions")
        .orderBy($"max_partition_bytes")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      prevCost match {
        case Some(v) => spark.conf.set(costKey, v)
        case None => spark.conf.unset(costKey)
      }
    }
  }

  def all: Seq[GraftQuery] = Seq(q83PartitionedWrite, q131ClusteredWrite,
    q176ZorderWrite, q457RowgroupStats, q459ScanPartitioning)
}
