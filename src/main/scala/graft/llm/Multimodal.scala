package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §2.10 — multimodal column plumbing: media as opaque `binary`
  * columns + typed metadata, with decode/feature-extract running batch-wise
  * per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` below is a
  * clearly-marked DETERMINISTIC FAKE of the decode step (real impl would
  * call the codec on `payload` bytes). Everything around it — the binary
  * column schema, the per-partition batching via `mapPartitions` on a typed
  * `Dataset`, the metadata struct shape, partition-parallel execution with
  * no shuffle — is the real 100 TB plumbing: swap `decodeStub` for a codec
  * call and nothing else changes. */
object Multimodal {

  /** Opaque media payload row (payload would be image/audio/video bytes). */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Typed decode output: media metadata + content hash. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, channels: Int, sha: String)

  /** DETERMINISTIC FAKE decode — stands in for the codec call (???) the
    * container cannot host. Derives "dimensions" arithmetically from the
    * byte length so the oracle can state the same arithmetic in SQL. */
  def decodeStub(in: MediaIn, digest: MessageDigest): MediaMeta = {
    val n = in.payload.length.toLong
    MediaMeta(
      doc_id = in.doc_id,
      n_bytes = n,
      width = (n % 640).toInt,
      height = ((n * 7) % 480).toInt,
      channels = 3,
      sha = digest.digest(in.payload).map("%02x".format(_)).mkString)
  }

  /** Binary-column pipeline: text bytes stand in for media payloads; decode
    * runs per partition with per-partition codec init (the `MessageDigest`
    * models a codec handle you must not share across threads). */
  val q56MultimodalMeta: GraftQuery = GraftQuery.oracled(
    "q56_multimodal_meta",
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       octet_length(encode(text)) % 640 AS width,
      |       (octet_length(encode(text)) * 7) % 480 AS height,
      |       3 AS channels,
      |       sha256(text) AS sha
      |FROM documents
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[MediaIn]
    media.mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-256") // per-partition "codec" init
      rows.map(r => decodeStub(r, digest))
    }.toDF()
      .select($"doc_id", $"n_bytes", $"width", $"height", $"channels", $"sha")
      .orderBy($"doc_id")
  }

  /** Raw-file multimodal ingest via Spark's `binaryFile` source — the edge
    * where media blobs actually enter a lake (an external system drops
    * `<id>.bin` files; Spark lists + reads them distributed, one row per
    * file with path/length/content). Here each document's UTF-8 bytes stand
    * in for a media blob: a `foreachPartition` task fan-out materializes the
    * files (distributed, no driver loop), then the binaryFile scan reads
    * them back, parses the id from the path, and verifies content integrity
    * (length + sha) against the parquet ground truth via the oracle.
    *
    * 100 TB notes: binaryFile is the INGEST format only — one row per file
    * means the file listing, not the data, becomes the bottleneck at
    * billions of blobs. The at-rest form is q56's parquet binary column
    * (thousands of blobs per columnar file); this query is the edge that
    * feeds it. Files larger than `spark.sql.files.maxPartitionBytes` still
    * land in one task (binary rows don't split) — shard oversized media
    * upstream. */
  val q116BinaryFileIngest: GraftQuery = GraftQuery.oracled(
    "q116_binaryfile_ingest",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       sha256(text) AS sha
      |FROM documents
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val out = java.nio.file.Paths.get("/tmp/graft-io", s"blobs_${System.nanoTime()}")
    java.nio.file.Files.createDirectories(out)
    val outStr = out.toString
    Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .foreachPartition { rows: Iterator[(Long, String)] =>
        rows.foreach { case (id, text) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outStr, s"$id.bin"),
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    spark.read.format("binaryFile").load(outStr)
      .select(
        regexp_extract($"path", "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        sha2($"content", 256).as("sha"))
      .orderBy($"doc_id")
  }

  def all: Seq[GraftQuery] = Seq(q56MultimodalMeta, q116BinaryFileIngest)
}
