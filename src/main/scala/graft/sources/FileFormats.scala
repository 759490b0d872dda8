package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.GraftQuery

/** SURVEY.md §2.1 — CSV and JSON sources/sinks (the reference category's
  * ingest formats), exercised as engine-writer → engine-reader round-trips.
  * The oracle states the ORIGINAL table's contents: if the engine's CSV/JSON
  * sink or scan corrupted anything (quoting, types, encoding), the round-trip
  * result would diverge from the parquet ground truth and hash-mismatch.
  *
  * Each invocation writes to a fresh directory so previously returned
  * readers stay valid (queries may run concurrently/twice — Bench min-of-2).
  *
  * Schemas are EXPLICIT on read (SURVEY.md §1.1: schema inference at 100 TB
  * means a type-guessing scan of petabytes — never acceptable). */
object FileFormats {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Paths.get("/tmp/graft-io", s"${tag}_${System.nanoTime()}")
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  /** CSV sink + scan round-trip on `region` (header, explicit schema). */
  val q67CsvRoundtrip: GraftQuery = GraftQuery.oracled(
    "q67_csv_roundtrip",
    """SELECT r_regionkey, r_name FROM region
      |ORDER BY r_regionkey""") { (spark, dir) =>
    import spark.implicits._
    val out = freshDir("region_csv")
    Tables.region(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType, nullable = true),
      StructField("r_name", StringType, nullable = true)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .orderBy($"r_regionkey")
  }

  /** JSON-lines sink + scan round-trip on `nation` (explicit schema). */
  val q68JsonRoundtrip: GraftQuery = GraftQuery.oracled(
    "q68_json_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""") { (spark, dir) =>
    import spark.implicits._
    val out = freshDir("nation_json")
    Tables.nation(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = true),
      StructField("n_name", StringType, nullable = true),
      StructField("n_regionkey", IntegerType, nullable = true)))
    spark.read.schema(schema).json(out)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .orderBy($"n_nationkey")
  }

  /** ORC sink + scan round-trip on `supplier` (explicit schema; exercises a
    * columnar format with its own type system — int32 vs int64, double —
    * through the writer AND the vectorized ORC reader). */
  val q99OrcRoundtrip: GraftQuery = GraftQuery.oracled(
    "q99_orc_roundtrip",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
      |ORDER BY s_suppkey""") { (spark, dir) =>
    import spark.implicits._
    val out = freshDir("supplier_orc")
    Tables.supplier(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").orc(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType, nullable = true),
      StructField("s_name", StringType, nullable = true),
      StructField("s_nationkey", IntegerType, nullable = true),
      StructField("s_acctbal", DoubleType, nullable = true)))
    spark.read.schema(schema).orc(out)
      .orderBy($"s_suppkey")
  }

  /** Parquet schema evolution: batch 1 written with (doc_id, text_len),
    * batch 2 later adds a `lang` column; `mergeSchema=true` reads both with
    * NULLs where the old files lack the column — the standard additive-
    * column story for a long-lived 100 TB lake. (Footer merging costs one
    * file-listing pass; production layouts record the merged schema in a
    * catalog instead of re-merging per read — noted, not modeled here.) */
  val q104SchemaEvolution: GraftQuery = GraftQuery.oracled(
    "q104_schema_evolution",
    """SELECT doc_id, text_len, lang FROM (
      |  SELECT doc_id, length(text) AS text_len, CAST(NULL AS VARCHAR) AS lang
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, length(text) AS text_len, lang
      |  FROM documents WHERE doc_id % 2 = 1
      |) ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val out = freshDir("docs_evolving")
    val docs = Tables.documents(spark, dir)
    docs.filter($"doc_id" % 2 === 0)
      .select($"doc_id", length($"text").as("text_len"))
      .write.mode("overwrite").parquet(out + "/b1")
    docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", length($"text").as("text_len"), $"lang")
      .write.mode("overwrite").parquet(out + "/b2")
    spark.read.option("mergeSchema", "true").parquet(out + "/b1", out + "/b2")
      .select($"doc_id", $"text_len", $"lang")
      .orderBy($"doc_id")
  }

  /** Small-file compaction — the lake-maintenance op that follows any
    * fine-grained ingest (q116's one-file-per-blob edge, streaming sinks,
    * hourly partitions): a 64-fragment copy of `documents` is rewritten into
    * few right-sized files. At 100 TB small files are a listing/scheduling
    * tax (one task + one footer read each) and an object-store request-rate
    * tax; the fix is exactly this rewrite, sized by bytes-per-file targets
    * (`repartition(n)` here; `maxRecordsPerFile` caps the other direction).
    * The oracle states the ORIGINAL table: compaction must be content-
    * preserving, and the row-count/file-count invariants are asserted
    * in-query via the re-read. */
  val q128Compaction: GraftQuery = GraftQuery.oracled(
    "q128_compaction",
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val frag = freshDir("docs_fragmented")
    val compact = freshDir("docs_compacted")
    val docs = Tables.documents(spark, dir)
    docs.repartition(64).write.mode("overwrite").parquet(frag) // the ingest debris
    val nFrag = new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet"))
    spark.read.parquet(frag)
      .repartition(2) // target size: whole table in 2 files at this sf
      .write.mode("overwrite").parquet(compact)
    val nCompact = new java.io.File(compact).listFiles().count(_.getName.endsWith(".parquet"))
    require(nFrag > 32 && nCompact <= 2, s"compaction shape: $nFrag -> $nCompact files")
    spark.read.parquet(compact)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Raw-lines TEXT source/sink round-trip — the plain-text ingest shape a
    * web-corpus pipeline starts from (WET files: one record per line, no
    * schema). Written as tab-delimited `doc_id\ttext` lines, read back with
    * `spark.read.text` and re-split with a limit-2 split (text may contain
    * any character except the delimiter and newlines — asserted clean for
    * this corpus; a production ingest would length-prefix or JSON-escape).
    * The text source is splittable by line boundary, so a 100 TB directory
    * scans with full parallelism like CSV; the oracle states the original
    * table, proving the round-trip is byte-preserving. */
  val q129TextRoundtrip: GraftQuery = GraftQuery.oracled(
    "q129_text_roundtrip",
    """SELECT doc_id, text FROM documents
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val out = freshDir("docs_text")
    Tables.documents(spark, dir)
      .select(concat_ws("\t", $"doc_id", $"text").as("value"))
      .write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(split($"value", "\t", 2).as("kv"))
      .select($"kv".getItem(0).cast("long").as("doc_id"),
        $"kv".getItem(1).as("text"))
      .orderBy($"doc_id")
  }

  def all: Seq[GraftQuery] =
    Seq(q67CsvRoundtrip, q68JsonRoundtrip, q99OrcRoundtrip, q104SchemaEvolution,
      q128Compaction, q129TextRoundtrip)
}
