package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{TakeOrderedAndProjectExec, GlobalLimitExec, CollectLimitExec, LocalLimitExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution

/** Builder-side audit of every BroadcastNestedLoopJoin / CartesianProduct
  * in the named queries' plans: for each, print WHICH side is the broadcast
  * build side and whether that side is BOUNDED by construction (an
  * aggregate, a limit, or a LocalTableScan of literals sits below it) —
  * the evidence needed before adding a query to PlanAuditSpec's
  * scalarBroadcastExempt list. Not part of the driver contract. */
object BnljAudit {
  private def bounded(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: BaseAggregateExec => a: Any
      case t: TakeOrderedAndProjectExec => t
      case g: GlobalLimitExec => g
      case c: CollectLimitExec => c
      case l: LocalLimitExec => l
      case s if s.nodeName == "LocalTableScan" => s
    }.nonEmpty

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.sparkPlan
      plan.foreach {
        case j: BroadcastNestedLoopJoinExec =>
          val buildLeft = j.requiredChildDistribution.head
            .isInstanceOf[BroadcastDistribution]
          val build = if (buildLeft) j.left else j.right
          println(s"$name BNLJ build=${if (buildLeft) "left" else "right"} " +
            s"bounded=${bounded(build)} root=${build.nodeName}")
        case c: CartesianProductExec =>
          println(s"$name CARTESIAN leftBounded=${bounded(c.left)} " +
            s"rightBounded=${bounded(c.right)}")
        case _ =>
      }
    }
    spark.stop()
  }
}
