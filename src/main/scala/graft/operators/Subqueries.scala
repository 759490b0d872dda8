package graft.operators

import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §4 — subquery forms through the SQL entry point (lifecycle E2),
  * exercising Catalyst's RewriteCorrelatedScalarSubquery and
  * RewritePredicateSubquery (→ semi/anti join) batches. The oracle runs the
  * IDENTICAL text in DuckDB — the two planners must agree on semantics. */
object Subqueries {

  private def sqlQuery(name: String, sql: String): GraftQuery =
    GraftQuery.oracled(name, sql) { (spark, dir) =>
      Tables.views(spark, dir)
      spark.sql(sql.stripMargin)
    }

  /** Correlated scalar subquery: orders above their customer's average
    * (decorrelated by Catalyst into an aggregate + join). */
  val q79CorrelatedScalar: GraftQuery = sqlQuery(
    "q79_correlated_scalar",
    """SELECT o_orderkey, o_custkey
      |FROM orders o
      |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice)
      |                          FROM orders o2
      |                          WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""")

  /** Uncorrelated scalar subquery: global-average comparison (a broadcast
    * scalar at scale — one extra tiny job, no per-row recompute). */
  val q80UncorrelatedScalar: GraftQuery = sqlQuery(
    "q80_uncorrelated_scalar",
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) + 4000
      |ORDER BY c_custkey""")

  /** EXISTS / NOT EXISTS predicate subqueries (rewritten to semi/anti
    * joins — same physical shape as q16/q17, arrived at from SQL). */
  val q81ExistsSubquery: GraftQuery = sqlQuery(
    "q81_exists_subquery",
    """SELECT s_suppkey, s_name
      |FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey
      |                AND l.l_quantity >= 50 AND l.l_discount >= 0.09)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_suppkey = s.s_suppkey
      |                    AND l2.l_quantity <= 1 AND l2.l_discount <= 0.005)
      |ORDER BY s_suppkey""")

  /** IN-subquery over an aggregated derived table. */
  val q82InSubquery: GraftQuery = sqlQuery(
    "q82_in_subquery",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      |  AND o_orderstatus = 'F'
      |ORDER BY o_orderkey""")

  /** Correlated LATERAL subquery — top-3 orders per customer as a lateral
    * ORDER BY + LIMIT, the SQL twin of q31's window top-k. Catalyst
    * decorrelates the lateral into a ranked join (DecorrelateInnerQuery),
    * so the physical plan is one shuffle + per-group limit, never a
    * per-customer re-scan of orders; both engines run the IDENTICAL text. */
  val q125LateralTopk: GraftQuery = sqlQuery(
    "q125_lateral_topk",
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |                          WHERE o.o_custkey = c.c_custkey
      |                          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
      |WHERE c_custkey < 100
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")

  /** Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): generate the
    * 84-month calendar spine 1995-01..2001-12 recursively, then left-join
    * order totals onto it — the calendar-spine idiom that reports empty
    * months as zeros, with the spine built by the engine instead of a
    * staged dimension table. IDENTICAL text runs in DuckDB.
    *
    * Scale note: the recursion materializes 84 rows on the driver side of
    * the plan (bounded by the WHERE, far under the recursion depth limit);
    * the join broadcasts the spine against the fact scan — recursion depth
    * is independent of fact size. */
  val q198RecursiveCte: GraftQuery = sqlQuery(
    "q198_recursive_cte",
    """WITH RECURSIVE months(m) AS (
      |  SELECT CAST('1995-01-01' AS DATE) AS m
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m FROM months
      |  WHERE m < CAST('2001-12-01' AS DATE)
      |)
      |SELECT m, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      |       round(coalesce(sum(o_totalprice), 0.0), 2) AS total
      |FROM months LEFT JOIN orders
      |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      |GROUP BY m
      |ORDER BY m""")

  /** SQL pipe syntax (Spark 4, SPARK-49555): the same pricing rollup
    * written as a |> pipeline — FROM |> WHERE |> EXTEND |> AGGREGATE
    * ... GROUP BY |> ORDER BY. The oracle states the classic-SQL
    * equivalent (DuckDB has no pipe syntax), so the two surface forms
    * must plan to the same result. Revenue is exact cent integers.
    *
    * Scale note: pipe syntax is pure surface — it parses to the identical
    * logical plan (filter → project → hash agg → sort) as the classic
    * form; nothing about execution changes. */
  val q213PipeSyntax: GraftQuery = GraftQuery.oracled(
    "q213_pipe_syntax",
    """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem
      |WHERE l_quantity >= 30
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (spark, dir) =>
    Tables.views(spark, dir)
    spark.sql(
      """FROM lineitem
        ||> WHERE l_quantity >= 30
        ||> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        ||> AGGREGATE CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CAST(floor(disc_price * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** GROUP BY ALL / ORDER BY ALL (Spark 4 ergonomics, SPARK-44346): every
    * non-aggregate select item groups implicitly, and the sort covers the
    * whole select list — IDENTICAL text runs in DuckDB (which pioneered the
    * syntax). Semantics, not just sugar: both planners must infer the same
    * grouping set. */
  val q214GroupByAll: GraftQuery = sqlQuery(
    "q214_group_by_all",
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""")

  /** Modern SQL-entry surface in one query: NAMED PARAMETER MARKERS
    * (`spark.sql(text, args)` — injection-safe literals bound by the
    * parser), the `IDENTIFIER()` clause (table name as a bound constant —
    * the safe dynamic-SQL primitive), and LATERAL COLUMN ALIASES (`net`
    * referenced by `fee` in the same SELECT). The oracle is the same query
    * with the bindings resolved — parameterization must be semantically
    * invisible. The discount/fee rates bind as DOUBLEs, and the oracle
    * CASTs its literals to DOUBLE so both engines run identical float
    * arithmetic (not decimal).
    *
    * Scale note: parameters resolve at parse time, so the plan is the
    * usual filter-pushdown + partial agg — nothing dynamic survives into
    * execution. */
  val q232SqlSurface: GraftQuery = GraftQuery.oracled(
    "q232_sql_surface",
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(fee), 2) AS fees
      |FROM (
      |  SELECT o_orderpriority,
      |         o_totalprice * (1 - CAST(0.04 AS DOUBLE)) AS net,
      |         net * CAST(0.01 AS DOUBLE) AS fee
      |  FROM orders
      |  WHERE o_orderstatus = 'F')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    Tables.views(spark, dir)
    spark.sql(
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(fee), 2) AS fees
        |FROM (
        |  SELECT o_orderpriority,
        |         o_totalprice * (1 - :disc) AS net,
        |         net * :feerate AS fee
        |  FROM IDENTIFIER(:tbl)
        |  WHERE o_orderstatus = :status)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      Map("disc" -> 0.04, "feerate" -> 0.01, "tbl" -> "orders", "status" -> "F"))
  }

  /** SQL-LANGUAGE UDFs (Spark 4 `CREATE FUNCTION … RETURN expr`) — the
    * §2.11 tier ZERO the catalog's UDF ladder was missing below Catalyst
    * Expressions: a function DEFINED in SQL is inlined into the plan at
    * resolution (Catalyst sees the expression tree, codegen and pushdown
    * apply) — strictly better than any black-box Scala UDF when the logic
    * is expressible. A scalar UDF (net price) and a TABLE function
    * (per-flag revenue summary, `RETURNS TABLE`) both exercise the
    * surface; the oracle states the inlined computation directly, which
    * IS the semantics of SQL-function inlining.
    *
    * 100 TB plan: identical to writing the expression inline — zero
    * serialization boundary, zero codegen break, full predicate pushdown
    * through the function body. The reason to ban Scala UDFs is exactly
    * that this alternative exists. */
  val q329SqlUdf: GraftQuery = GraftQuery.oracled(
    "q329_sql_udf",
    """SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS net_revenue,
      |       round(avg(CASE WHEN l_quantity >= 25 THEN l_extendedprice * (1 - l_discount) END), 2) AS avg_bulk_net
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net(price DOUBLE, disc DOUBLE, tax DOUBLE)
        |RETURNS DOUBLE RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(price DOUBLE, disc DOUBLE)
        |RETURNS DOUBLE RETURN price * (1 - disc)""".stripMargin)
    spark.sql(
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(graft_net(l_extendedprice, l_discount, l_tax)), 2) AS net_revenue,
        |       round(avg(CASE WHEN l_quantity >= 25
        |                      THEN graft_disc_price(l_extendedprice, l_discount) END), 2) AS avg_bulk_net
        |FROM lineitem_v
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** TPC-H Q20 SHAPE (nested aggregate inside IN, hand-decorrelated) —
    * "dominant suppliers": suppliers who, for some part, shipped more
    * than a FIFTH of that part's total quantity (the threshold that keeps
    * the answer non-empty at every test SF). The SQL form is an IN
    * subquery whose HAVING holds a CORRELATED scalar aggregate — the
    * double-nesting that breaks naive subquery rewriters. The engine
    * side ships the decorrelated plan EXPLICITLY (per-part totals
    * broadcast into the per-(supplier, part) census, integer 5·x > y
    * dominance test, then one semi-join), and the oracle runs the
    * nested-subquery text — the strict match proves the decorrelation
    * preserves semantics. Quantities are summed as BIGINT so the
    * dominance comparison is exact.
    *
    * 100 TB plan: two map-side-combined censuses over one lineitem scan
    * (part-keyed and (supplier, part)-keyed — the second reuses the
    * first's shuffle prefix), a broadcast of the part totals, and a
    * semi-join against the supplier dim. No per-row subquery ever runs. */
  val q358DominantSupplier: GraftQuery = GraftQuery.oracled(
    "q358_dominant_supplier",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem l1
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING 5 * sum(CAST(l_quantity AS BIGINT)) >
      |         (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
      |          WHERE l2.l_partkey = l1.l_partkey))
      |ORDER BY s_suppkey""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_partkey", $"l_quantity".cast("long").as("qty"))
    val perPart = li.groupBy($"l_partkey").agg(sum($"qty").as("part_qty"))
    val perSp = li.groupBy($"l_suppkey", $"l_partkey").agg(sum($"qty").as("sp_qty"))
    val dominant = perSp.join(broadcast(perPart), Seq("l_partkey"))
      .filter(lit(5) * $"sp_qty" > $"part_qty")
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  def all: Seq[GraftQuery] = Seq(
    q79CorrelatedScalar, q80UncorrelatedScalar, q81ExistsSubquery, q82InSubquery,
    q125LateralTopk, q198RecursiveCte, q213PipeSyntax, q214GroupByAll,
    q232SqlSurface, q329SqlUdf, q358DominantSupplier)
}
