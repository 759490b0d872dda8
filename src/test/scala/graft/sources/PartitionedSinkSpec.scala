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
}
