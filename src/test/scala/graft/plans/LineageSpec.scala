package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the column-lineage walker: the exact expected map for q466's
  * frame, pass-through identity, and the no-phantom-source law (every
  * reported source must be a real column of the named table). */
class LineageSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("q466 frame lineage is exactly the expected source map") {
    val got = Lineage.q466ColumnLineage.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "o_orderpriority" -> "orders.o_orderpriority",
      "n" -> "",
      "net_revenue" -> "lineitem.l_discount,lineitem.l_extendedprice",
      "avg_qty_tax" -> "lineitem.l_quantity,lineitem.l_tax"))
  }

  test("pass-through projection keeps leaf lineage; derived column unions refs") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sf)
    val df = li.select($"l_orderkey",
      ($"l_extendedprice" * $"l_quantity").as("gross"))
      .filter($"l_orderkey" > 0)
      .select($"l_orderkey", $"gross")
    val m = Lineage.columnLineage(df).toMap
    assert(m("l_orderkey") === Seq("lineitem.l_orderkey"))
    assert(m("gross") === Seq("lineitem.l_extendedprice", "lineitem.l_quantity"))
  }

  test("no phantom sources: every reported table.column exists in its table") {
    import spark.implicits._
    val cols = Map(
      "lineitem" -> graft.sources.Tables.lineitem(spark, sf).columns.toSet,
      "orders" -> graft.sources.Tables.orders(spark, sf).columns.toSet)
    Lineage.q466ColumnLineage.fn(spark, sf).collect().foreach { r =>
      r.getString(1).split(",").filter(_.nonEmpty).foreach { s =>
        val Array(t, c) = s.split("\\.", 2)
        assert(cols(t).contains(c), s"phantom source $s")
      }
    }
  }
}
