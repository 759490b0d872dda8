package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Gates for the extension batch: skew tooling, vocab ops, stream sources,
  * partition-local sort (SURVEY.md §2.1/§2.6/§2.10). */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("salted join result equals the plain join (any replica count)") {
    import spark.implicits._
    val fact = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
    val build = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority")
    for (r <- Seq(2, 8)) {
      val salted = graft.operators.Skew.saltedJoin(fact, build,
          $"l_orderkey", $"o_orderkey", $"l_linenumber" * 1000000 + $"l_orderkey", r)
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      val plain = fact.join(build, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      assert(salted === plain, s"replicas=$r")
    }
  }

  test("CountVectorizer vocabulary equals relational distinct non-stopword tokens") {
    import spark.implicits._
    val rows = graft.ml.MlExtras.q75StopwordsCountvec.fn(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)),
      "vocab_matches contract flag must be TRUE on every term (set equality " +
        "between the fitted vocabulary and the exact census)")
    val vocab = rows.map(_.getString(0)).toSet
    val stop = new org.apache.spark.ml.feature.StopWordsRemover().getStopWords.toSet
    val relational = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .filter(!$"t".isin(stop.toSeq: _*)).filter($"t" =!= "")
      .distinct().collect().map(_.getString(0)).toSet
    assert(vocab === relational)
  }

  test("observe(): pipeline-instrumentation metrics equal a direct aggregate") {
    import spark.implicits._
    // observe() rides the existing pass over the data — the zero-extra-job
    // way to count rows/nulls/totals in a 100 TB pipeline, vs a second scan.
    val observed = Tables.lineitem(spark, sf)
      .observe("li_metrics",
        count(lit(1)).as("n_rows"),
        sum($"l_quantity").as("total_qty"),
        count_if($"l_discount" > 0.05).as("n_discounted"))
    observed.collect() // run THIS dataset's execution; metrics attach to it
    val row = observed.queryExecution.observedMetrics("li_metrics")
    val direct = Tables.lineitem(spark, sf)
      .agg(count(lit(1)), sum($"l_quantity"), count_if($"l_discount" > 0.05)).head
    assert(row.getLong(0) === direct.getLong(0))
    assert(row.getDouble(1) === direct.getDouble(1))
    assert(row.getLong(2) === direct.getLong(2))
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    import spark.implicits._
    // The runtime-filter optimization Spark applies at 100 TB: a selective
    // filter on the dim side injects a bloom/semi filter into the fact scan
    // so most fact rows drop before the shuffle. Assert the rewrite fires
    // (plan-level), and that results are unchanged with it disabled.
    val run = { (bloomOn: Boolean) =>
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloomOn)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // smoke-sf tables are far below the 10GB production default — drop the
      // size gates so the rewrite is decided by shape, not byte counts
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", false)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force a shuffle join so the filter matters
      try {
        val dim = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
        val fact = Tables.lineitem(spark, sf)
        val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        (joined.queryExecution.optimizedPlan.toString, joined.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      } finally {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val (planOn, resOn) = run(true)
    val (planOff, resOff) = run(false)
    def hasBloom(p: String) =
      p.toLowerCase.contains("might_contain") || p.toLowerCase.contains("bloomfilter")
    assert(hasBloom(planOn), s"expected an injected bloom filter in:\n$planOn")
    assert(!hasBloom(planOff))
    assert(resOn === resOff)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // One hot key owning ~90% of the probe side — the shape that stalls a
    // 1000-executor job on one straggler reducer. With the skew thresholds
    // scaled down to smoke size, AQE must re-plan the sort-merge join and
    // split the hot partition (the runtime complement to Skew.saltedJoin,
    // which handles the cases AQE can't re-plan).
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // pad = md5 hex: incompressible, so the hot partition's COMPRESSED
      // shuffle size (what AQE's MapStatus reports) actually reflects skew —
      // a constant-key shuffle of bare longs compresses to almost nothing
      val fact = spark.range(0, 200000)
        .select((when($"id" % 2 === 0, 7L).otherwise($"id")).as("k"),
          md5($"id".cast("string")).as("pad"))
      val dim = spark.range(0, 5000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = fact.join(dim, Seq("k"))
        .groupBy().agg(count(lit(1)).as("n"), sum(length($"pad")).as("pad_bytes"))
      // collect() (not head()) so THIS dataset's adaptive plan executes and
      // finalizes — head() wraps a new limited plan whose AQE state we can't see
      val row = joined.collect()(0)
      // every fact row with k < 5000 matches exactly one dim row
      val expected = fact.filter($"k" < 5000).count()
      assert(row.getLong(0) === expected)
      assert(row.getLong(1) === expected * 32)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"AQE skew split did not fire:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("rate stream source produces monotonically increasing values") {
    import spark.implicits._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
    val qn = s"rate_${System.nanoTime()}"
    val q = rate.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200)
      q.processAllAvailable()
      val vals = spark.table(qn).select($"value").collect().map(_.getLong(0)).sorted
      assert(vals.nonEmpty)
      assert(vals.toSeq === (vals.min to vals.max).toSeq) // contiguous sequence
    } finally q.stop()
  }

  test("sortWithinPartitions: each written file is locally sorted (writer pattern)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    Tables.orders(spark, sf)
      .repartition(4, $"o_custkey")
      .sortWithinPartitions($"o_orderdate")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2)
    for (f <- files) {
      // o_orderdate reads back as TIMESTAMP_NTZ → java.time.LocalDateTime
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select($"o_orderdate").collect()
        .map(_.getAs[java.time.LocalDateTime](0))
      assert(ts.zip(ts.tail).forall { case (a, b) => !a.isAfter(b) },
        s"${f.getName} not locally sorted")
    }
  }

  test("bucketed co-located join: no shuffle exchange on either side") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    // the in-memory catalog forgets managed tables across JVMs but their
    // directories persist — scrub them or saveAsTable hits LOCATION_ALREADY_EXISTS
    for (t <- Seq("li_bucketed", "orders_bucketed")) {
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    // merge hint: force SMJ so the broadcast path can't mask the bucketing
    val joined = spark.table("li_bucketed")
      .join(spark.table("orders_bucketed").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() === expected)
  }

  test("Word2Vec trains with fixed seed and single partition (dim check)") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf).limit(100)
      .select(split($"text", " ").as("words"))
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(16).setMinCount(1).setSeed(42).setNumPartitions(1).setMaxIter(1)
    val model = w2v.fit(toks)
    assert(model.getVectors.count() > 0)
    val v = model.transform(toks).select($"vec").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size === 16)
  }
}
