package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.sources.Tables

/** Hand-computed/property assertions for SURVEY.md §2.2/§2.6 operators
  * beyond what the DuckDB oracle covers. */
class RelationalCoreSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("q01 pricing summary aggregates the full filtered lineitem") {
    val df = RelationalCore.q01PricingSummary.fn(spark, sf)
    val rows = df.collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01 00:00:00"))).count()
    assert(totalCount === expected)
  }

  test("randomSplit is disjoint, exhaustive, and seed-reproducible") {
    import spark.implicits._
    val o = Tables.orders(spark, sf)
    val Array(a1, b1) = o.randomSplit(Array(0.8, 0.2), seed = 42)
    val Array(a2, _) = o.randomSplit(Array(0.8, 0.2), seed = 42)
    assert(a1.count() + b1.count() === o.count())
    assert(a1.intersect(b1).count() === 0)
    assert(a1.select($"o_orderkey").collect().toSet === a2.select($"o_orderkey").collect().toSet)
  }

  test("sample(fraction, seed) is reproducible and size-plausible") {
    val o = Tables.orders(spark, sf)
    val a = o.sample(withReplacement = false, 0.5, seed = 42)
    val b = o.sample(withReplacement = false, 0.5, seed = 42)
    assert(a.count() === b.count())
    assert(a.collect().toSeq === b.collect().toSeq)
    val n = o.count().toDouble
    assert(a.count() > n * 0.35 && a.count() < n * 0.65)
  }

  test("sampleBy: per-stratum ratios near fractions, seed-reproducible") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.25)
    val a = docs.stat.sampleBy("lang", fractions, 42L)
    val b = docs.stat.sampleBy("lang", fractions, 42L)
    assert(a.select($"doc_id").collect().toSet === b.select($"doc_id").collect().toSet)
    val totals = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, frac) <- fractions if totals.getOrElse(lang, 0L) >= 20) {
      val ratio = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(ratio - frac) < 0.2, s"$lang ratio $ratio vs fraction $frac")
    }
  }

  test("hash-bucket split: pure function of key, 80/10/10-ish, append-stable") {
    import spark.implicits._
    val full = RelationalCore.q102HashBucketSplit.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val n = full.size.toDouble
    val shares = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(shares("train") - 0.8) < 0.12, s"train share ${shares("train")}")
    // append-stability: recomputing on any subset assigns identical splits
    val subset = Tables.documents(spark, sf).filter($"doc_id" % 3 === 0)
    val sub = RelationalCore.q102HashBucketSplit.fn(spark, sf)
      .join(subset.select($"doc_id"), Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(sub.forall { case (id, s) => full(id) == s })
  }

  test("set ops: union/intersect/except algebra on custkeys") {
    import spark.implicits._
    val c = Tables.customer(spark, sf)
    val rich = c.filter($"c_acctbal" > 9000).select($"c_custkey")
    val auto = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
    val inter = rich.intersect(auto).count()
    val exceptN = rich.except(auto).count()
    assert(inter + exceptN === rich.distinct().count())
  }
}
