package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** SURVEY.md §5.4 — streaming equivalence + late-data semantics. */
class StreamingSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("tumbling-window stream replay equals batch aggregation") {
    import spark.implicits._
    val streamed = StreamingQueries.q61StreamTumbling.fn(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stateful sessionization: emitted sessions = batch sessions minus each user's open tail") {
    import spark.implicits._
    val emitted = StreamingQueries.q66StatefulSessions.fn(spark, sf)
    val batchSessions = graft.operators.Windows.q34Sessionize.fn(spark, sf)
    val perUserEmitted = emitted.groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUserBatch = batchSessions.groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUserBatch.keySet === perUserEmitted.keySet ++
      perUserBatch.filter(_._2 == 1).keys) // users with a single (still-open) session emit nothing
    for ((u, n) <- perUserEmitted) assert(n === perUserBatch(u) - 1)
  }

  test("watermark drops late events beyond the delay (MemoryStream, update mode)") {
    import spark.implicits._
    val source = MemoryStream[(Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(Timestamp, String)]], spark)
    val agg = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val qn = s"wm_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(qn).start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: events at 10:00 and 10:31 → watermark advances to 10:21
    source.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:31:00"), "a"))
    q.processAllAvailable()
    // batch 2: a late event at 10:05 — its window [10:00,10:10) < watermark → dropped
    source.addData((t("2024-01-01 10:05:00"), "a"))
    q.processAllAvailable()
    val rows = spark.table(qn)
      .select($"window.start".as("ws"), $"n")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toList
    q.stop()
    // the 10:00 window must still show n=1 (late row dropped), never n=2
    assert(rows.contains(t("2024-01-01 10:00:00") -> 1L))
    assert(!rows.contains(t("2024-01-01 10:00:00") -> 2L))
  }

  test("dropDuplicatesWithinWatermark keeps one row per key across batches") {
    import spark.implicits._
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Timestamp, Long)]], spark)
    val dedup = source.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("id"))
    val qn = s"ddww_${System.nanoTime()}"
    val q = dedup.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(qn).start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      source.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:00:30"), 1L))
      q.processAllAvailable()
      source.addData((t("2024-01-01 10:01:00"), 1L), (t("2024-01-01 10:01:00"), 2L))
      q.processAllAvailable()
      val ids = spark.table(qn).select($"id").collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 2L)) // id=1 deduped across rows AND batches within watermark
    } finally q.stop()
  }

  test("stream-stream join equals the batch self-join at smoke sf") {
    import spark.implicits._
    val streamed = StreamingQueries.q77StreamStreamJoin.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.sources.Tables.events(spark, sf)
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("cts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("pu"), $"ts".as("pts"))
    val batch = c.join(p, $"user_id" === $"pu" &&
        $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 10 MINUTE"))
      .select($"click_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("aggregation state survives a checkpointed restart (state store durability)") {
    import spark.implicits._
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(Timestamp, String)]], spark)
    val counts = source.toDF().toDF("ts", "k").groupBy($"k").count()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def t(s: String) = Timestamp.valueOf(s)

    val q1 = counts.writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(s"ck1_${System.nanoTime()}").start()
    source.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:00:01"), "a"),
      (t("2024-01-01 10:00:02"), "b"))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: committed batch is NOT replayed,
    // but the per-key counts come back from the state store
    val qn2 = s"ck2_${System.nanoTime()}"
    val q2 = counts.writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(qn2).start()
    source.addData((t("2024-01-01 10:00:03"), "a"))
    q2.processAllAvailable()
    val result = spark.table(qn2).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q2.stop()
    assert(result === Map("a" -> 3L, "b" -> 1L),
      s"state not restored across restart: $result")
  }

  test("file sink exactly-once: restart from the same checkpoint re-emits nothing") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-eo").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    def run(): Unit = {
      val q = StreamingQueries.eventsStream(spark, sf)
        .select($"event_id", $"event_type")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val n1 = spark.read.parquet(out).count()
    assert(n1 === graft.sources.Tables.events(spark, sf).count())
    // second run, same checkpoint, same input: the committed batch must
    // NOT replay — the file manifest is the exactly-once ledger
    run()
    val n2 = spark.read.parquet(out).count()
    assert(n2 === n1, s"restart duplicated output: $n1 -> $n2")
  }

  test("foreachBatch sink: every microbatch lands, totals match the source") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-feb").toString
    val stream = StreamingQueries.eventsStream(spark, sf)
      .select($"event_id", $"event_type")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(s"$out/b")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(s"$out/b").count()
    assert(written === graft.sources.Tables.events(spark, sf).count())
  }

  test("foreachBatch upsert: last-writer-wins across micro-batches") {
    import spark.implicits._
    // 3 files replayed one per trigger → keys recur across batches, so the
    // upsert log holds several versions per key and only the latest may win.
    val src = java.nio.file.Files.createTempDirectory("graft-upsert-src").toString
    Seq(("a", 1L), ("b", 1L), ("a", 1L), ("c", 1L), ("a", 1L), ("b", 1L))
      .toDF("k", "v").repartition(3)
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("k STRING, v LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val agg = stream.groupBy($"k").agg(count(lit(1)).as("n"))
    val base = java.nio.file.Files.createTempDirectory("graft-upsert")
    val compact = StreamingQueries.foreachBatchUpsert(agg, Seq("k"), base)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val log = spark.read.parquet(base.resolve("data").toString)
    assert(log.select($"batch_id").distinct().count() >= 3,
      "replay should have run one micro-batch per file")
    assert(log.count() > compact.size, "log keeps superseded versions")
    assert(compact === Map("a" -> 3L, "b" -> 2L, "c" -> 1L),
      s"compact view must equal the full batch aggregation: $compact")
  }

  test("assembleSessions: gap rule unit check") {
    import StreamingQueries.{assembleSessions, Ev}
    def ev(id: Long, s: String) = Ev(1L, id, Timestamp.valueOf(s))
    val sessions = assembleSessions(Seq(
      ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
      ev(3, "2024-01-01 11:00:00"), // 50-min gap → new session
      ev(4, "2024-01-01 11:29:00")), gapMs = 30 * 60 * 1000)
    assert(sessions.map(_.n_events) === Seq(2L, 2L))
    assert(sessions.head.session_end === Timestamp.valueOf("2024-01-01 10:10:00"))
  }

  test("space-saving stream: heavy-hitter containment and est/err bounds vs exact counts") {
    import spark.implicits._
    val m = 8
    val got = StreamingQueries.q359StreamSpaceSaving.fn(spark, sf).collect()
    assert(got.nonEmpty)
    val exact = graft.sources.Tables.events(spark, sf)
      .select($"event_type",
        floor(sqrt(get_json_object($"props", "$.k").cast("double")))
          .cast("long").as("item"))
      .groupBy($"event_type", $"item").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nPerKey = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val resident = got.map(r => (r.getString(0), r.getLong(1))).toSet
    // (1) guarantee: true count > n/m  ⇒  item is resident in final state
    for (((key, item), c) <- exact if c.toDouble > nPerKey(key).toDouble / m)
      assert(resident((key, item)),
        s"heavy hitter ($key, $item) with count $c > ${nPerKey(key)}/$m evicted")
    for (r <- got) {
      val key = r.getString(0); val item = r.getLong(1)
      val est = r.getLong(2); val err = r.getLong(3); val nTot = r.getLong(4)
      val c = exact.getOrElse((key, item), 0L)
      // (2) overestimate-only, bounded by the inherited error
      assert(est >= c, s"($key, $item): est $est < true $c")
      assert(est - err <= c, s"($key, $item): est-err ${est - err} > true $c")
      assert(nTot === nPerKey(key), s"$key: n_total $nTot != ${nPerKey(key)}")
    }
    // bounded state: at most m counters per key survived
    got.groupBy(_.getString(0)).foreach { case (k, rows) =>
      assert(rows.length <= m, s"$k holds ${rows.length} > $m counters")
    }
  }
}
