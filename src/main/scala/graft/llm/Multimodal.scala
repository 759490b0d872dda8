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

  /** One sampled "video frame": index, byte offset, slice length, content
    * hash of the frame's byte window. */
  final case class FrameOut(
      doc_id: Long, frame_idx: Long, frame_offset: Long, frame_bytes: Long, frame_sha: String)

  /** FRAME SAMPLING — the video-side row-expansion op (decode q56 is 1:1;
    * this is 1:N): each payload "decodes" to ⌊n/100⌋+1 fixed-size frames
    * and every 5th is sampled and fingerprinted. The frame WINDOWING is
    * the real operator (typed flatMap inside `mapPartitions`, one codec
    * handle per partition, frames emitted lazily — no per-doc frame list
    * is ever materialized); the "decode" is the documented arithmetic
    * stub (frame = a 100-byte window of the payload), so the oracle can
    * state the identical windows with substr + sha256.
    *
    * 100 TB plan: pure map-side expansion — no shuffle at all until a
    * consumer aggregates; sampling stride caps output at corpus_bytes/500
    * rows. Oversized media split upstream per q116's note. */
  val q317FrameSample: GraftQuery = GraftQuery.oracled(
    "q317_frame_sample",
    """WITH f AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
      |idx AS (SELECT doc_id, text, i AS frame_idx
      |        FROM f, LATERAL (SELECT unnest(generate_series(0, CAST(nb // 100 AS BIGINT), 5)) AS i))
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |       CAST(frame_idx * 100 AS BIGINT) AS frame_offset,
      |       CAST(octet_length(encode(substr(text, CAST(frame_idx * 100 + 1 AS INTEGER), 100))) AS BIGINT) AS frame_bytes,
      |       sha256(substr(text, CAST(frame_idx * 100 + 1 AS INTEGER), 100)) AS frame_sha
      |FROM idx
      |ORDER BY doc_id, frame_idx""") { (spark, dir) =>
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[MediaIn]
    media.mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-256") // per-partition codec handle
      rows.flatMap { r =>
        val n = r.payload.length
        (0 to n / 100 by 5).iterator.map { i =>
          val frame = r.payload.slice(i * 100, math.min(i * 100 + 100, n))
          FrameOut(r.doc_id, i.toLong, i * 100L, frame.length.toLong,
            digest.digest(frame).map("%02x".format(_)).mkString)
        }
      }
    }.toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** RESIZE PLANNING — the aspect-preserving fit-to-box (224×224) every
    * vision-model preprocessor runs, split the way a Spark pipeline
    * actually splits it: the TARGET GEOMETRY is computed relationally
    * from the decoded metadata (q56's width/height — this query), and
    * only the pixel resample itself belongs in the per-partition codec
    * stub. Landscape clamps width, portrait clamps height, scale
    * reported in exact ppm; degenerate 0-dimension media pass through
    * flagged with NULL geometry (skip, don't crash, at 100 TB).
    *
    * 100 TB plan: a pure projection over q56's decode output — map-side,
    * shuffle-free, and the resize work ships to executors already knowing
    * every output buffer size. */
  val q318ResizePlan: GraftQuery = GraftQuery.oracled(
    "q318_resize_plan",
    """WITH m AS (SELECT doc_id,
      |                  octet_length(encode(text)) % 640 AS w,
      |                  (octet_length(encode(text)) * 7) % 480 AS h
      |           FROM documents)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CASE WHEN w > 0 AND h > 0
      |            THEN CAST(CASE WHEN w >= h THEN 224 ELSE CAST(floor(224.0 * w / h) AS BIGINT) END AS BIGINT) END AS out_w,
      |       CASE WHEN w > 0 AND h > 0
      |            THEN CAST(CASE WHEN w >= h THEN CAST(floor(224.0 * h / w) AS BIGINT) ELSE 224 END AS BIGINT) END AS out_h,
      |       CASE WHEN w > 0 AND h > 0
      |            THEN CAST(floor(1000000.0 * 224 / greatest(w, h)) AS BIGINT) END AS scale_ppm
      |FROM m
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val m = Tables.documents(spark, dir)
      .select($"doc_id",
        (octet_length($"text".cast("binary")) % 640).cast("long").as("w"),
        ((octet_length($"text".cast("binary")) * 7) % 480).cast("long").as("h"))
    val ok = $"w" > 0 && $"h" > 0
    m.select($"doc_id", $"w".as("width"), $"h".as("height"),
        when(ok, when($"w" >= $"h", lit(224L))
          .otherwise(floor(lit(224.0) * $"w" / $"h").cast("long"))).as("out_w"),
        when(ok, when($"w" >= $"h", floor(lit(224.0) * $"h" / $"w").cast("long"))
          .otherwise(lit(224L))).as("out_h"),
        when(ok, floor(lit(1000000.0) * 224 / greatest($"w", $"h")).cast("long"))
          .as("scale_ppm"))
      .orderBy($"doc_id")
  }

  /** MAGIC-NUMBER FORMAT SNIFFING over a `binary` column — the first gate
    * of every media ingest (trust the BYTES, not the extension/metadata):
    * classify each payload by its leading magic (PNG/JPEG/RIFF here), and
    * emit the byte length plus the full hex image of the bytes. Payloads
    * are SYNTHESIZED deterministically (magic prefix ‖ md5-derived body,
    * via the engine-portable unhex), and the output strict-compares
    * `hex(payload)` — a bijection of the bytes — so the cross-engine
    * binary round-trip proof (parquet BINARY ↔ DuckDB BLOB) survives
    * WITHOUT emitting a raw binary column: the driver's pandas compare
    * cannot sort raw bytearray cells, so binary stays internal and the
    * lossless hex projection is the verified surface.
    *
    * 100 TB plan: one projection inside whole-stage codegen — the sniff
    * reads a 4-byte prefix per row, no decode, no shuffle; the format
    * census (the usual production output) is one map-side-combinable agg
    * away. */
  val q484MagicSniff: GraftQuery = GraftQuery.oracled(
    "q484_magic_sniff",
    """WITH b AS (
      |  SELECT doc_id,
      |         unhex(CASE CAST(doc_id % 4 AS INTEGER)
      |                 WHEN 0 THEN '89504e47' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 24)
      |                 WHEN 1 THEN 'ffd8ffe0' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 24)
      |                 WHEN 2 THEN '52494646' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 24)
      |                 ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 32)
      |               END) AS payload
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |       CASE substr(hex(payload), 1, 8)
      |         WHEN '89504E47' THEN 'png'
      |         WHEN 'FFD8FFE0' THEN 'jpeg'
      |         WHEN '52494646' THEN 'riff'
      |         ELSE 'unknown' END AS fmt,
      |       hex(payload) AS payload_hex
      |FROM b ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val body = md5($"doc_id".cast("string"))
    val payload = unhex(
      when($"doc_id" % 4 === 0, concat(lit("89504e47"), substring(body, 1, 24)))
        .when($"doc_id" % 4 === 1, concat(lit("ffd8ffe0"), substring(body, 1, 24)))
        .when($"doc_id" % 4 === 2, concat(lit("52494646"), substring(body, 1, 24)))
        .otherwise(substring(body, 1, 32)))
    Tables.documents(spark, dir)
      .select($"doc_id", payload.as("payload"))
      .select($"doc_id",
        length($"payload").cast("long").as("n_bytes"),
        when(substring(hex($"payload"), 1, 8) === "89504E47", "png")
          .when(substring(hex($"payload"), 1, 8) === "FFD8FFE0", "jpeg")
          .when(substring(hex($"payload"), 1, 8) === "52494646", "riff")
          .otherwise("unknown").as("fmt"),
        hex($"payload").as("payload_hex"))
      .orderBy($"doc_id")
  }

  /** PNG IHDR HEADER PARSE over a `binary` column — the metadata-extraction
    * step after q484's magic sniff: real PNG structure (8-byte signature ‖
    * 4-byte chunk length ‖ "IHDR" ‖ width:int32-BE ‖ height:int32-BE ‖
    * bit-depth ‖ color-type ‖ compression/filter/interlace), parsed FROM
    * THE BYTES at the spec's fixed offsets — width at bytes 16–19, height
    * 20–23, depth 24, color-type 25 (PNG spec, ISO/IEC 15948 §11.2.2).
    * Payloads are SYNTHESIZED structurally-valid headers (no image body —
    * honest: no codecs in this container), with dimensions derived from
    * doc_id, so BOTH engines build and parse the identical 29 bytes: the
    * q484 pattern extended from 4-byte magic to real field extraction.
    *
    * 100 TB plan: a pure projection inside whole-stage codegen — hex-slice
    * + integer parse per row, no decode, no shuffle; the (width × height)
    * resize planner (q318) and the format census consume it map-side. */
  val q486PngHeaderParse: GraftQuery = GraftQuery.oracled(
    "q486_png_header_parse",
    """WITH b AS (SELECT doc_id,
      |                  16 + doc_id % 640 AS w, 16 + (doc_id * 7) % 480 AS h,
      |                  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 6 END AS ct
      |           FROM documents),
      |p AS (SELECT doc_id,
      |             '89504E470D0A1A0A' || '0000000D' || '49484452'
      |             || lpad(hex(w), 8, '0') || lpad(hex(h), 8, '0') || '08'
      |             || lpad(hex(ct), 2, '0') || '000000' AS payload_hex
      |      FROM b)
      |SELECT doc_id, payload_hex,
      |       CAST(('0x' || substr(payload_hex, 33, 8)) AS BIGINT) AS width,
      |       CAST(('0x' || substr(payload_hex, 41, 8)) AS BIGINT) AS height,
      |       CAST(('0x' || substr(payload_hex, 49, 2)) AS BIGINT) AS bit_depth,
      |       CAST(('0x' || substr(payload_hex, 51, 2)) AS BIGINT) AS color_type,
      |       (CAST(('0x' || substr(payload_hex, 51, 2)) AS BIGINT) = 2) AS is_truecolor_opaque
      |FROM p ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val hdr = concat(lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      lpad(hex(lit(16) + $"doc_id" % 640), 8, "0"),
      lpad(hex(lit(16) + ($"doc_id" * 7) % 480), 8, "0"), lit("08"),
      lpad(hex(when($"doc_id" % 2 === 0, 2).otherwise(6)), 2, "0"),
      lit("000000"))
    // round-trip through a REAL binary column (unhex → hex) so the parse
    // genuinely reads bytes, not the string it was built from
    Tables.documents(spark, dir)
      .select($"doc_id", unhex(hdr).as("payload"))
      .select($"doc_id", hex($"payload").as("payload_hex"))
      .select($"doc_id", $"payload_hex",
        conv(substring($"payload_hex", 33, 8), 16, 10).cast("long").as("width"),
        conv(substring($"payload_hex", 41, 8), 16, 10).cast("long").as("height"),
        conv(substring($"payload_hex", 49, 2), 16, 10).cast("long").as("bit_depth"),
        conv(substring($"payload_hex", 51, 2), 16, 10).cast("long").as("color_type"),
        (conv(substring($"payload_hex", 51, 2), 16, 10).cast("long") === 2L)
          .as("is_truecolor_opaque"))
      .orderBy($"doc_id")
  }

  def all: Seq[GraftQuery] = Seq(q56MultimodalMeta, q116BinaryFileIngest,
    q317FrameSample, q318ResizePlan, q484MagicSniff, q486PngHeaderParse)
}
