package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.engine.GraftQuery
import graft.sources.Tables

/** Schema-driven data profiling (SURVEY.md §4 EDA surface): one pass per
  * column producing the row count, null count, exact distinct count and
  * min/max rendered as text — the table-of-contents report every ingestion
  * pipeline emits before a dataset is accepted. The profile query is
  * GENERATED from `df.schema` (type-dispatched rendering), so it works on
  * any table; the oracle spells the same plan out column-by-column.
  *
  * 100 TB plan: each column's profile is one hash aggregate (the distinct
  * count dominates); columns profile independently, so the union fans out
  * as parallel jobs over column-pruned scans — profiling column c reads
  * ONLY column c thanks to parquet projection pushdown. Swap
  * `count(DISTINCT …)` for `approx_count_distinct` per q29 when exactness
  * isn't worth the shuffle. */
object Profiler {

  /** Render a column's min/max as text, dispatching on dtype so both
    * engines format identically (timestamps pinned to seconds precision —
    * plain casts disagree on fractional rendering). */
  private def profileOf(df: DataFrame, name: String): DataFrame = {
    val dt = df.schema(name).dataType
    def render(c: Column): Column = dt match {
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case _ => c.cast("string")
    }
    df.agg(
      count(lit(1)).cast("long").as("n"),
      (count(lit(1)) - count(col(name))).cast("long").as("n_null"),
      countDistinct(col(name)).cast("long").as("n_distinct"),
      render(min(col(name))).as("min_s"),
      render(max(col(name))).as("max_s"))
      .select(lit(name).as("col_name"), col("n"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Full profile of the `events` table, one row per column. */
  val q183ColumnProfile: GraftQuery = GraftQuery.oracled(
    "q183_column_profile",
    """WITH e AS (SELECT event_id, date_trunc('microseconds', ts) AS ts,
      |                  user_id, event_type, value, props
      |           FROM events)
      |SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
      |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
      |       CAST(min(event_id) AS VARCHAR) AS min_s,
      |       CAST(max(event_id) AS VARCHAR) AS max_s FROM e
      |UNION ALL
      |SELECT 'event_type', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(event_type) AS BIGINT),
      |       CAST(count(DISTINCT event_type) AS BIGINT),
      |       min(event_type), max(event_type) FROM e
      |UNION ALL
      |SELECT 'props', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(props) AS BIGINT),
      |       CAST(count(DISTINCT props) AS BIGINT),
      |       min(props), max(props) FROM e
      |UNION ALL
      |SELECT 'ts', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(ts) AS BIGINT),
      |       CAST(count(DISTINCT ts) AS BIGINT),
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') FROM e
      |UNION ALL
      |SELECT 'user_id', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(user_id) AS BIGINT),
      |       CAST(count(DISTINCT user_id) AS BIGINT),
      |       CAST(min(user_id) AS VARCHAR),
      |       CAST(max(user_id) AS VARCHAR) FROM e
      |UNION ALL
      |SELECT 'value', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(value) AS BIGINT),
      |       CAST(count(DISTINCT value) AS BIGINT),
      |       CAST(min(value) AS VARCHAR),
      |       CAST(max(value) AS VARCHAR) FROM e
      |ORDER BY col_name""") { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    ev.columns.sorted
      .map(c => profileOf(ev, c))
      .reduce(_ unionByName _)
  }

  def all: Seq[GraftQuery] = Seq(q183ColumnProfile)
}
