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

  test("union merges per-position sources across ALL branches") {
    import spark.implicits._
    // branch 1 feeds the column from lineitem, branch 2 from orders; Union
    // reuses branch 1's exprIds, so without the Union case the orders
    // source would vanish (ADVICE r5)
    val a = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("k"), $"l_extendedprice".as("v"))
    val b = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("v"))
    val m = Lineage.columnLineage(a.unionByName(b)).toMap
    assert(m("k") === Seq("lineitem.l_orderkey", "orders.o_orderkey"))
    assert(m("v") === Seq("lineitem.l_extendedprice", "orders.o_totalprice"))
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
