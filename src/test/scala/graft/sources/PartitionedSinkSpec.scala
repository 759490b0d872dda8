package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The partitioned layout must actually prune: the scan's plan carries the
  * partition predicate as a PartitionFilter (directory-level skip), not a
  * data filter. */
class PartitionedSinkSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("partitionBy write produces status directories and partition pruning fires") {
    import spark.implicits._
    val out = PartitionedSink.writeDir("orders_part_spec")
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))

    val pruned = spark.read.parquet(out).filter($"o_orderstatus" === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("o_orderstatus"),
      s"partition filter not pushed:\n$plan")

    val expected = Tables.orders(spark, sf).filter($"o_orderstatus" === "F").count()
    assert(pruned.count() === expected)
  }

  test("z-order files bound BOTH dims; single-column clustering smears the second") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // Mean per-file normalized span of each dimension (1.0 = the file
    // covers the dimension's full range — no skipping possible on it).
    def meanSpans(layout: DataFrame => DataFrame): (Double, Double) = {
      val li = Tables.lineitem(spark, sf)
        .select($"l_partkey".cast("int").as("p"), $"l_suppkey".cast("int").as("s"))
      val out = PartitionedSink.writeDir("zorder_spec")
      layout(li).write.mode("overwrite").parquet(out)
      val glob = spark.read.parquet(out)
        .agg((max($"p") - min($"p") + 1).as("rp"), (max($"s") - min($"s") + 1).as("rs"))
        .head()
      val (rp, rs) = (glob.getInt(0).toDouble, glob.getInt(1).toDouble)
      val m = spark.read.parquet(out)
        .groupBy(input_file_name())
        .agg((max($"p") - min($"p") + 1).as("sp"), (max($"s") - min($"s") + 1).as("ss"))
        .agg(avg($"sp" / rp).as("mp"), avg($"ss" / rs).as("ms"))
        .head()
      (m.getDouble(0), m.getDouble(1))
    }
    val (zp, zs) = meanSpans { df =>
      val mm = df.agg(min($"p").as("plo"), max($"p").as("phi"),
        min($"s").as("slo"), max($"s").as("shi"))
      df.crossJoin(broadcast(mm))
        .withColumn("z", PartitionedSink.zorder16(
          PartitionedSink.grid8($"p", $"plo", $"phi"),
          PartitionedSink.grid8($"s", $"slo", $"shi")))
        .repartitionByRange(16, $"z").sortWithinPartitions($"z")
        .drop("z", "plo", "phi", "slo", "shi")
    }
    val (lp, ls) = meanSpans(df => df
      .repartitionByRange(16, $"p").sortWithinPartitions($"p"))
    // Linear clustering: tight on p, but every file spans ~all of s.
    assert(ls > 0.95, s"linear layout should smear suppkey, got mean span $ls")
    // Z-order: BOTH dims bounded well below full range per file.
    assert(zp < 0.6 && zs < 0.6,
      s"z-order should bound both dims, got p-span $zp, s-span $zs")
    assert(lp < 0.2, s"sanity: linear layout clusters p tightly, got $lp")
  }
}
