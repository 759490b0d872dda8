package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer surface (SURVEY §2.11 planner levers): ANALYZE
  * TABLE statistics must reach the planner — table/column stats visible in
  * the catalog, row-count estimates propagated THROUGH a join when CBO is
  * on, and the estimate in the right order of magnitude. At 100 TB these
  * estimates are what pick broadcast sides and join orders; a pipeline
  * that never ANALYZEs runs on guesses.
  *
  * Note: `LogicalPlan.stats` reads `SQLConf.get` (the ACTIVE session's
  * thread-local conf), so the CBO flags must be set on the session that is
  * active when `.stats` is evaluated — a `newSession()` with its own conf
  * silently reads the parent's cbo=false. Set-and-restore on the shared
  * fixture session instead.
  */
class CboSpec extends AnyFunSuite with graft.SparkFixture {

  test("ANALYZE stats are cataloged and propagate row counts through a join under CBO") {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    graft.sources.Tables.customer(spark, sf)
      .write.mode("overwrite").saveAsTable("cbo_cust")
    graft.sources.Tables.orders(spark, sf)
      .write.mode("overwrite").saveAsTable("cbo_orders")
    try {
      spark.sql("ANALYZE TABLE cbo_cust COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      val custRows = spark.table("cbo_cust").count()
      val orderRows = spark.table("cbo_orders").count()
      // catalog-level stats exist and are exact
      val described = spark.sql("DESCRIBE TABLE EXTENDED cbo_cust")
        .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(described.contains(custRows.toString),
        s"ANALYZE row count missing from catalog stats:\n$described")
      // CBO propagates a row-count ESTIMATE through the join
      val joined = spark.sql(
        """SELECT c.c_nationkey, count(*) AS n
          |FROM cbo_orders o JOIN cbo_cust c ON o.o_custkey = c.c_custkey
          |GROUP BY c.c_nationkey""".stripMargin)
      val stats = joined.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined,
        "CBO on + ANALYZE'd tables must yield a row-count estimate")
      // FK equi-join keeps ~orderRows rows; the estimate must be in range
      val est = stats.rowCount.get.toLong
      assert(est > 0 && est <= orderRows * 100,
        s"join row estimate $est wildly off (orders = $orderRows)")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
      spark.sql("DROP TABLE IF EXISTS cbo_cust")
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }
}
