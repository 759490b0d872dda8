package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.sources.Tables

class EdaSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("describe emits the five summary rows with exact count") {
    val rows = Eda.q84Describe.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("count", "max", "mean", "min", "stddev"))
    val countRow = rows.find(_.getString(0) == "count").get
    assert(countRow.getDouble(1).toLong === Tables.lineitem(spark, sf).count())
  }

  test("quantile discretizer: 5 buckets, near-equal occupancy, ordered ranges") {
    import spark.implicits._
    val buckets = Eda.q85QuantileDiscretize.fn(spark, sf).collect()
    assert(buckets.length === 5)
    val total = buckets.map(_.getLong(1)).sum
    val expect = total / 5.0
    assert(buckets.forall(b => math.abs(b.getLong(1) - expect) < expect * 0.25),
      s"unbalanced buckets: ${buckets.map(_.getLong(1)).toSeq}")
    // ranges are disjoint and ascending by bucket id
    val his = buckets.sortBy(_.getDouble(0)).map(_.getDouble(3))
    assert(his.zip(his.tail).forall { case (a, b) => a <= b })
  }

  test("q347 approx-scale Huber tracks q319's exact fit (bounded drift)") {
    val exact = Eda.q319HuberIrls.fn(spark, sf).collect().head
    val approx = Eda.q347HuberApproxScale.fn(spark, sf).collect().head
    assert(approx.getLong(approx.fieldIndex("n")) ===
      exact.getLong(exact.fieldIndex("n")))
    // the sketch's 1e-4 rank error can shift the MAD a hair, moving a few
    // boundary rows across the w<1 line and nudging the coefficients —
    // bound the drift tightly in relative terms
    def d(name: String) = math.abs(
      approx.getDouble(approx.fieldIndex(name)) -
        exact.getDouble(exact.fieldIndex(name)))
    val bExact = math.abs(exact.getDouble(exact.fieldIndex("b_huber")))
    val sExact = math.abs(exact.getDouble(exact.fieldIndex("scale")))
    assert(d("b_huber") <= 0.01 * math.max(bExact, 1e-9),
      s"slope drift ${d("b_huber")} vs exact $bExact")
    assert(d("scale") <= 0.01 * math.max(sExact, 1e-9),
      s"scale drift ${d("scale")} vs exact $sExact")
    val ndE = exact.getLong(exact.fieldIndex("n_downweighted")).toDouble
    val ndA = approx.getLong(approx.fieldIndex("n_downweighted")).toDouble
    assert(math.abs(ndA - ndE) <= math.max(5.0, 0.01 * ndE),
      s"downweighted-count drift: $ndA vs $ndE")
  }

  test("q375 freqItems: no false negatives above the 10% support") {
    import spark.implicits._
    // raw sketch gate — q375 now emits the contract as driver-oracle'd
    // booleans; this probes the raw candidate lists behind the flags
    val li = graft.sources.Tables.lineitem(spark, sf)
    val cand = li.stat.freqItems(Seq("l_returnflag", "l_linestatus"), 0.1).head
    val flags = cand.getSeq[String](0).toSet
    val statuses = cand.getSeq[String](1).toSet
    val n = li.count().toDouble
    def heavies(c: String): Set[String] = li.groupBy(col(c)).count()
      .collect().filter(_.getLong(1) > 0.1 * n).map(_.getString(0)).toSet
    val hf = heavies("l_returnflag"); val hs = heavies("l_linestatus")
    assert(hf.subsetOf(flags), s"missing heavy return flags: ${hf -- flags}")
    assert(hs.subsetOf(statuses), s"missing heavy line statuses: ${hs -- statuses}")
    // the entry's exact hot lists and driver-facing flags
    val row = Eda.q375FreqItems.fn(spark, sf).collect().head
    def parse(j: String): Set[String] =
      j.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSet
    assert(parse(row.getAs[String]("hot_flags")) === hf)
    assert(parse(row.getAs[String]("hot_statuses")) === hs)
    assert(row.getAs[Boolean]("flags_no_false_negative"))
    assert(row.getAs[Boolean]("statuses_no_false_negative"))
  }
}
