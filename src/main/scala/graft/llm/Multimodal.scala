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

  def all: Seq[GraftQuery] = Seq(q56MultimodalMeta)
}
