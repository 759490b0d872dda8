package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Equivalence laws for the two-phase global-window machinery: every
  * TwoPhase helper must produce BIT-IDENTICAL results to the single-window
  * formulation it replaces, on real (events/orders) data with ties and
  * with deliberately lopsided bucket choices. These are the laws that let
  * thirteen catalog queries swap their partition-less windows for the
  * two-phase plan with their oracles unchanged. */
class TwoPhaseSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  test("rowNumber == global row_number, with total") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"value")
    val naive = e.withColumn("rn",
        row_number().over(Window.orderBy($"value", $"event_id")).cast("long"))
      .select($"event_id", $"rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = TwoPhase.rowNumber(e,
        bucket = floor($"value" / 25.0),
        sort = Seq($"value", $"event_id"),
        out = "rn", totalOut = Some("n"))
      .select($"event_id", $"rn", $"n")
      .collect()
    assert(two.map(r => r.getLong(0) -> r.getLong(1)).toMap === naive)
    assert(two.forall(_.getLong(2) == naive.size.toLong), "total must be N on every row")
  }

  test("rowNumber handles a DESC sort with a negated bucket") {
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    val naive = o.withColumn("rn",
        row_number().over(Window.orderBy($"o_totalprice".desc, $"o_orderkey")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val two = TwoPhase.rowNumber(o, floor(-$"o_totalprice" / 10000.0),
        Seq($"o_totalprice".desc, $"o_orderkey"), out = "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(two === naive)
  }

  test("runningSum == global cumulative sum (ties present in the sort key)") {
    import spark.implicits._
    val c = graft.sources.Tables.events(spark, sf)
      .groupBy($"value").agg(count(lit(1)).as("cnt"))
    val naive = c.withColumn("cum",
        sum($"cnt").over(Window.orderBy($"value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    val two = TwoPhase.runningSum(c, floor($"value"), Seq($"value"), $"cnt", "cum")
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(two === naive)
  }

  test("runningMaxExclusive == RANGE-to-minus-1 max over a unique key") {
    import spark.implicits._
    val gm = graft.sources.Tables.part(spark, sf)
      .groupBy($"p_retailprice").agg(max($"p_size").as("m"))
    val naive = gm.withColumn("x",
        max($"m").over(Window.orderBy($"p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .collect().map(r => r.getDouble(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    val two = TwoPhase.runningMaxExclusive(gm, floor($"p_retailprice" / 10.0),
        Seq($"p_retailprice"), $"m", "x")
      .collect().map(r => r.getDouble(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(two === naive)
  }

  test("runningSumKeyed == per-key cumulative sum (hot low-cardinality key)") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("cents"),
        md5($"event_id".cast("string")).as("coin"))
    val naive = e.withColumn("cum",
        sum($"cents").over(Window.partitionBy($"event_type")
          .orderBy($"coin", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    val two = TwoPhase.runningSumKeyed(e, Seq("event_type"),
        conv(substring($"coin", 1, 2), 16, 10).cast("long"),
        Seq($"coin", $"event_id"), $"cents", "cum")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(two === naive)
  }

  test("rowNumberKeyed == per-key row_number (hot low-cardinality key)") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", md5($"doc_id".cast("string")).as("coin"))
    val naive = d.withColumn("rk",
        row_number().over(Window.partitionBy($"lang")
          .orderBy($"coin", $"doc_id")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val two = TwoPhase.rowNumberKeyed(d, Seq("lang"),
        conv(substring($"coin", 1, 2), 16, 10).cast("long"),
        Seq($"coin", $"doc_id"), "rk")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rk")).toMap
    assert(two === naive)
  }

  test("ntileFromRn == SQL ntile for k not dividing N") {
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    val naive = o.withColumn("t",
        ntile(7).over(Window.orderBy($"o_totalprice", $"o_orderkey")))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val two = TwoPhase.rowNumber(o, floor($"o_totalprice" / 10000.0),
        Seq($"o_totalprice", $"o_orderkey"), out = "rn", totalOut = Some("n"))
      .select($"o_orderkey", TwoPhase.ntileFromRn($"rn", $"n", 7).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two === naive)
  }
}
