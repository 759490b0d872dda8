package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: an idiomatic Spark query/pipeline plus — when
  * the operation is SQL-expressible — its ANSI-SQL twin for the driver's
  * DuckDB oracle (SURVEY.md §5.1).
  *
  * Catalog discipline (SURVEY.md §7): SURVEY.md §2 is the checklist, and the
  * assembled catalog in [[graft.SparkEntry]] is its manifest. Every oracle'd
  * query must be output-deterministic: full `ORDER BY` with unique tie-break
  * keys on BOTH sides, money/stat doubles `round(x, k)` on BOTH sides but
  * kept as DOUBLE — never DECIMAL: the driver's value-hash reads our parquet
  * via pandas (DECIMAL → `Decimal('1.50')`) and the oracle via DuckDB
  * (DECIMAL → float `1.5`), so numerically-equal decimals still hash-mismatch
  * on trailing zeros (round-2 root cause, 24 queries) —
  * and `events.ts` truncated to microseconds on the DuckDB
  * side (ns parquet vs Spark µs TimestampType, SURVEY.md §5.6).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object GraftQuery {

  /** A query with a DuckDB-verifiable ANSI-SQL twin. */
  def oracled(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle.stripMargin.trim), doc)

  /** Non-SQL-expressible op (approx algorithms, ML fits, streaming, LSH):
    * the driver records a weaker rows-only check; correctness is asserted in
    * ScalaTest instead (SURVEY.md §5.2–5.5). */
  def rowsOnly(name: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None, doc)
}
