package graft
import org.apache.spark.sql.SparkSession

/** Driver-run throughput benchmark: per-query `fn(spark, sfDir).count()`
  * wall time, one JSON line on stdout.
  *
  * Each query runs TWICE and reports the MIN: the first pass absorbs JIT /
  * whole-stage-codegen compilation and page-cache warmup, and min-of-two
  * suppresses one-off host stalls (observed ±3× per-query noise on the
  * shared box with identical code). Total = sum of per-query minima.
  *
  * A failing query is NOT silently timed: its error is recorded and the JSON
  * line carries an `"errors"` object mapping query name → exception, so a
  * crash benches loudly instead of as a fast green number.
  *
  * `SPARK_GRAFT_BENCH_FORCE=1` switches the action from `count()` to a noop
  * sink write (`format("noop")`), which evaluates EVERY column of every row.
  * Under `count()` Catalyst prunes unreferenced computed columns and drops
  * sorts, so a projection-only query (q47, q51–q54, q102, q103) benches as a
  * bare parquet row count — exactly how q105's ~270 s/side signature cost
  * stayed invisible through round 3. The driver's protocol stays `count()`;
  * the forced mode is the self-audit (see the verify recipe). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val force = sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Builder-iteration subset (comma-separated names); the driver never
    // sets this, so its per-round protocol is unchanged.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (force) df.write.format("noop").mode("overwrite").save()
          else df.count()
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              (e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse(""))
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val mode = if (force) "force" else "count"
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"mode":"$mode","sf":"$sfDir"}"""
    val compactLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"errors":$errs,"mode":"$mode","sf":"$sfDir"}"""
    // Capture-proof artifact: the full record (per-query map included) at
    // the repo root, immune to stdout tail truncation and sbt prefixes.
    // Only the driver's protocol shape (count mode, full catalog) writes the
    // canonical BENCH.json; forced or subset self-audit runs go to a scratch
    // path so a single-query preflight can never clobber the round record
    // (which happened once: a 1-entry force record overwrote the 499-query
    // map at commit f29d5ff).
    val outPath =
      if (force || only.isDefined) "BENCH_scratch.json" else "BENCH.json"
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: java.io.IOException => () } // read-only cwd must not fail
    // the bench; fatal JVM errors (OOM/SOE) must still propagate and kill the
    // run loudly rather than print a healthy-looking summary line.
    spark.stop()
    println(fullLine)
    // FINAL stdout line, after spark.stop() so no late log interleaves: the
    // COMPACT summary (no per-query map). The driver captures a stdout TAIL;
    // the full line exceeds that capture at 460+ queries (rounds 1–5 parsed
    // null). Combined with build.sbt's StdoutOutput + showSuccess:=false,
    // this line is prefix-free, last, and small enough to always survive.
    println(compactLine)
    System.out.flush()
  }
}
