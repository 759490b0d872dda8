package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sources for the driver corpus (TESTDATA.md:13-15, FIXTURES.md).
  *
  * Scale note (100 TB): each loader is a plain `spark.read.parquet` so the
  * vectorized Parquet reader, predicate pushdown, and column pruning all
  * apply; at cluster scale the same call shards over a partitioned directory
  * unchanged. Never cache here — let each query's plan prune columns first.
  */
object Tables {

  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** `events` is also the replayable stream table (SURVEY.md §2.8). */
  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical encodings across driver data
    * generations: TIMESTAMP(NANOS) — which Spark 4 refuses outright
    * (PARQUET_TYPE_ILLEGAL), so it is read as a raw nanosecond long (legacy
    * conf) and truncated to µs — and native TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ. Both are
    * normalized to a µs `TimestampType` here: the session timezone is pinned
    * to UTC in every entrypoint, so the NTZ→LTZ cast is value-identical, and
    * either path lands bit-identical to DuckDB's
    * `date_trunc('microseconds', ts)` oracle twin (SURVEY.md §5.6). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw // already a µs TimestampType
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries (lifecycle E2,
    * SURVEY.md §3) resolve the same names the DuckDB oracle uses. Idempotent.
    *
    * `events` registers through [[events]] (µs-truncated TimestampType), not
    * the raw reader: the raw ns schema only resolves after the nanosAsLong
    * conf is set, so registering it raw made view setup depend on whether an
    * events-reading query happened to run earlier in the session (a latent
    * catalog-order bug), and µs semantics are what the oracle's
    * `date_trunc('microseconds', ts)` twin states anyway. */
  def views(spark: SparkSession, dir: String): Unit = {
    (star ++ Seq("documents", "embeddings"))
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
