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
    assert(countRow.getString(1).toLong === Tables.lineitem(spark, sf).count())
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
}
