package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.GraftQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog below is the manifest of SURVEY.md §2's operator inventory:
  * each module contributes named [[GraftQuery]] entries; SQL-expressible ones
  * carry their DuckDB oracle twin with identical column names and ORDER BY
  * on both sides (driver hash-compares, sorting columns by name first).
  */
object SparkEntry {

  def catalog: Seq[GraftQuery] =
    graft.operators.RelationalCore.all ++
      graft.operators.Joins.all ++
      graft.operators.Aggregates.all ++
      graft.operators.Windows.all ++
      graft.functions.ScalarFunctions.all ++
      graft.llm.Dedup.all ++
      graft.llm.Similarity.all ++
      graft.llm.TextAnalysis.all ++
      graft.llm.Multimodal.all ++
      graft.llm.Curation.all ++
      graft.ml.Classification.all ++
      graft.streaming.StreamingQueries.all ++
      graft.sources.FileFormats.all ++
      graft.functions.Aggregators.all ++
      graft.operators.Skew.all ++
      graft.ml.Features.all ++
      graft.ml.MlExtras.all ++
      graft.operators.TypedOps.all ++
      graft.operators.Subqueries.all ++
      graft.sources.PartitionedSink.all ++
      graft.sources.Warehouse.all ++
      graft.operators.Eda.all ++
      graft.operators.NullAndMisc.all ++
      graft.operators.EventAnalytics.all ++
      graft.operators.Graph.all ++
      graft.llm.Search.all ++
      graft.llm.FuzzyJoin.all ++
      graft.llm.Chunking.all ++
      graft.ml.Recommender.all ++
      graft.ml.Patterns.all ++
      graft.operators.Profiler.all ++
      graft.operators.Geo.all ++
      graft.operators.Governance.all ++
      graft.plans.Lineage.all ++
      graft.operators.SeriesOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.RelationalCore.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
