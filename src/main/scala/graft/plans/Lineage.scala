package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Project, Union, Window => WindowNode}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery

/** COLUMN-LEVEL LINEAGE extraction (SURVEY.md §2.11 engine-introspection
  * surface) — walk a query's ANALYZED logical plan and map every output
  * column to the set of source-table columns it derives from: the
  * impact-analysis/governance primitive ("which dashboards break if
  * l_discount changes semantics?") that catalogs like OpenLineage build
  * around, here computed from Catalyst's own attribute graph with zero
  * instrumentation.
  *
  * Mechanics: leaves (file relations) seed exprId → {table.column};
  * Project/Aggregate/Window nodes introduce new exprIds whose sources are
  * the union over their expressions' references; Generate (explode) maps
  * generator outputs to the generator's references; joins/filters/aliases
  * pass attributes through by exprId untouched. `foreachUp` visits
  * children first, so every reference is resolved when consumed. */
object Lineage {

  /** (output column, sorted source columns) for every column of `df`. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val m = scala.collection.mutable.Map[ExprId, Set[String]]()
    def sourcesOf(ne: NamedExpression): Set[String] =
      ne.references.toSeq.flatMap(r => m.getOrElse(r.exprId, Set.empty[String])).toSet
    df.queryExecution.analyzed.foreachUp {
      case lr: LogicalRelation =>
        val table = lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(_.getName.replaceAll("\\.parquet$", "")).getOrElse("unknown")
          case _ => "unknown"
        }
        lr.output.foreach(a => m(a.exprId) = Set(s"$table.${a.name}"))
      case p =>
        val named: Seq[NamedExpression] = p match {
          case pr: Project => pr.projectList
          case ag: Aggregate => ag.aggregateExpressions
          case w: WindowNode => w.windowExpressions
          case _ => Nil
        }
        named.foreach {
          case a: AttributeReference => () // pass-through keeps its entry
          case ne => m(ne.exprId) = sourcesOf(ne)
        }
        p match {
          case g: Generate =>
            val srcs = g.generator.references.toSeq
              .flatMap(r => m.getOrElse(r.exprId, Set.empty[String])).toSet
            g.generatorOutput.foreach(a => m(a.exprId) = srcs)
          case u: Union =>
            // Union output reuses the FIRST child's exprIds; a column is fed
            // by the corresponding position of EVERY branch — merge them, or
            // later-branch sources vanish from impact analysis (ADVICE r5)
            u.output.zipWithIndex.foreach { case (a, i) =>
              m(a.exprId) = u.children
                .flatMap(c => m.getOrElse(c.output(i).exprId, Set.empty[String]))
                .toSet
            }
          case _ => ()
        }
    }
    df.queryExecution.analyzed.output
      .map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String]).toSeq.sorted)
  }

  /** Lineage report for a representative two-table analytical frame
    * (join → derived columns → agg): every output column traced to its
    * parquet source columns. No SQL oracle (the lineage is a property of
    * the ENGINE's plan, not of the data); LineageSpec pins the exact
    * expected map and the no-phantom-source law.
    *
    * 100 TB story: lineage extraction is O(plan), data-independent — the
    * governance catalog gets populated by planning, not by scanning. */
  val q466ColumnLineage: GraftQuery = GraftQuery.rowsOnly(
    "q466_column_lineage",
    doc = "analyzed-plan column lineage of a join+derive+agg frame: output column -> source table columns") {
    (spark, dir) =>
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, dir)
    val o = graft.sources.Tables.orders(spark, dir)
    val frame = li.join(o, $"l_orderkey" === $"o_orderkey")
      .withColumn("net", $"l_extendedprice" * (lit(1) - $"l_discount"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"net").as("net_revenue"),
        avg($"l_quantity" + $"l_tax").as("avg_qty_tax"))
    columnLineage(frame)
      .toDF("column", "sources")
      .select($"column", concat_ws(",", $"sources").as("sources"))
      .orderBy($"column")
  }

  def all: Seq[GraftQuery] = Seq(q466ColumnLineage)
}
