package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** A WHOLE custom operator through the full Catalyst stack (SURVEY §2.11
  * tier (c)): logical node → planner strategy → physical exec, registered
  * at runtime via `spark.experimental.extraStrategies`.
  *
  * Top-k-per-group is THE window-function workload whose standard plan
  * (Exchange → Sort → Window → Filter) pays a full partition SORT just to
  * keep k rows. This operator declares the same clustered distribution —
  * so Catalyst still plans exactly ONE hash Exchange — but replaces the
  * sort+window with per-partition bounded heaps: O(n log k) heap pushes
  * instead of O(n log n) sort, and k·groups rows of memory instead of a
  * spillable full-partition sort buffer. At 100 TB that's the difference
  * between a sort-spill stage and a streaming scan. (Spark's own
  * WindowGroupLimit pushes a group-limit below the window but still sorts;
  * the Aggregator in q158 gets the same asymptotics via typed aggregation —
  * this is the native-physical-operator expression of the idea.)
  *
  * The exec keeps rows as UnsafeRow copies keyed by an UnsafeProjection of
  * the group columns; the per-group heap evicts the WORST row under the
  * given SortOrder (RowOrdering), so ties must be broken by a unique
  * column in the sort for deterministic output — same discipline as every
  * oracle'd window query. */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** One hash Exchange on the group key — and NOTHING else: no
    * requiredChildOrdering, so no SortExec is inserted. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orders = sortOrders
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val boundOrders = orders.map(
        BindReferences.bindReference(_, childOutput).asInstanceOf[SortOrder])
      // compare < 0 ⇔ ranks better under the sort; PQ dequeues the MAX
      // (= worst kept row), which is exactly what a bounded top-k evicts.
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
          boundOrders.toList, Seq.empty)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Public surface: top-k rows per group under `sort` — (column, desc)
    * pairs that must include a unique tie-break. Columns are resolved by
    * name against the child's ANALYZED output (the Spark 4 Column API
    * hands out lazy ColumnNodeExpressions that custom nodes can't carry,
    * so the node is built from fully-resolved attributes directly).
    * Registers the strategy on the session (idempotent) and splices the
    * logical node into the plan. */
  def topK(df: DataFrame, groupCols: Seq[String], sort: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val orders = sort.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val plan = TopKPerGroupPlan(groupCols.map(attr), orders, k, child)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
