package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §2 (governance surface) — privacy / release-risk audits a
  * training-data platform runs before any export: re-identification risk
  * (k-anonymity, Sweeney 2002; l-diversity, Machanavalli et al. 2007) over
  * quasi-identifier combinations. All census algebra: one hash-agg over the
  * table, audit-sized output, exact integers end to end. */
object Governance {

  /** K-ANONYMITY + L-DIVERSITY AUDIT — the release gate for any table with
    * person-level rows: group by the quasi-identifier tuple (nation,
    * market segment, $1000 account-balance band) and flag every
    * equivalence class that re-identifies (size < k=5) or leaks the
    * sensitive attribute (the in-debt flag) through uniformity
    * (l-diversity l=1 on classes of size ≥ k). These are THE two numbers
    * a privacy review asks for, and the flagged classes are the rows a
    * suppression/generalization pass would rewrite.
    *
    * 100 TB plan: one map-side-combined census hash-agg over the scan
    * (count + distinct-sensitive per QI tuple — distinct over a BOUNDED
    * 2-value sensitive domain collapses to two partial counters); the
    * output is violation-sized. Nothing row-scale ever joins row-scale. */
  val q351KAnonymity: GraftQuery = GraftQuery.oracled(
    "q351_k_anonymity",
    """WITH qi AS (SELECT c_nationkey, c_mktsegment,
      |                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |                   CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS in_debt
      |            FROM customer),
      |cls AS (SELECT c_nationkey, c_mktsegment, bal_band,
      |               CAST(count(*) AS BIGINT) AS n,
      |               CAST(count(DISTINCT in_debt) AS BIGINT) AS l_distinct
      |        FROM qi GROUP BY 1, 2, 3)
      |SELECT c_nationkey, c_mktsegment, bal_band, n, l_distinct,
      |       CASE WHEN n < 5 THEN 'k_violation' ELSE 'l_violation' END AS risk
      |FROM cls
      |WHERE n < 5 OR l_distinct = 1
      |ORDER BY c_nationkey, c_mktsegment, bal_band""") { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("bal_band"),
        when($"c_acctbal" < 0, 1).otherwise(0).as("in_debt"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct($"in_debt").cast("long").as("l_distinct"))
      .filter($"n" < 5 || $"l_distinct" === 1)
      .select($"c_nationkey", $"c_mktsegment", $"bal_band", $"n", $"l_distinct",
        when($"n" < 5, "k_violation").otherwise("l_violation").as("risk"))
      .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
  }

  /** RIGHT-TO-BE-FORGOTTEN PURGE MANIFEST — the deletion-request audit
    * every data platform must produce before (and after) a GDPR/CCPA
    * purge: given a tombstone predicate (here users/customers whose key
    * ends in 7 — the synthesized request batch), report per table how
    * many rows the purge removes and keeps, INCLUDING the FK cascade
    * (orders of tombstoned customers, then lineitems of those orders —
    * the two-hop cascade that naive per-table deletes miss). The ppm
    * share is the blast-radius number the DPO signs off on.
    *
    * 100 TB plan: events/orders purge flags are map-side predicates (no
    * join at all — the tombstone rule is a pure key function here; a
    * real id LIST broadcasts); the lineitem cascade is ONE broadcast
    * semi-join against the purged-order keys. Output is 3 rows. */
  val q363PurgeManifest: GraftQuery = GraftQuery.oracled(
    "q363_purge_manifest",
    """WITH ev AS (SELECT CAST(count(CASE WHEN user_id % 10 = 7 THEN 1 END) AS BIGINT) AS purged,
      |                   CAST(count(*) AS BIGINT) AS total
      |            FROM events),
      |od AS (SELECT CAST(count(CASE WHEN o_custkey % 10 = 7 THEN 1 END) AS BIGINT) AS purged,
      |              CAST(count(*) AS BIGINT) AS total
      |       FROM orders),
      |li AS (SELECT CAST(count(CASE WHEN o.o_custkey % 10 = 7 THEN 1 END) AS BIGINT) AS purged,
      |              CAST(count(*) AS BIGINT) AS total
      |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT t.tbl, t.purged, t.total - t.purged AS kept,
      |       CAST(1000000 * t.purged // t.total AS BIGINT) AS purge_ppm
      |FROM (SELECT 'events' AS tbl, * FROM ev
      |      UNION ALL SELECT 'orders', * FROM od
      |      UNION ALL SELECT 'lineitem', * FROM li) t
      |ORDER BY tbl""") { (spark, dir) =>
    import spark.implicits._
    def census(df: org.apache.spark.sql.DataFrame, tbl: String,
        purge: org.apache.spark.sql.Column) =
      df.agg(count(when(purge, 1)).cast("long").as("purged"),
          count(lit(1)).cast("long").as("total"))
        .select(lit(tbl).as("tbl"), $"purged", ($"total" - $"purged").as("kept"),
          expr("(1000000 * purged) div total").cast("long").as("purge_ppm"))
    val ev = census(Tables.events(spark, dir), "events", $"user_id" % 10 === 7)
    val od = census(Tables.orders(spark, dir), "orders", $"o_custkey" % 10 === 7)
    val purgedOrders = Tables.orders(spark, dir)
      .select($"o_orderkey", ($"o_custkey" % 10 === 7).as("p"))
    val li = census(
      Tables.lineitem(spark, dir).join(broadcast(purgedOrders),
        $"l_orderkey" === $"o_orderkey"),
      "lineitem", $"p")
    ev.unionByName(od).unionByName(li).orderBy($"tbl")
  }

  def all: Seq[GraftQuery] = Seq(q351KAnonymity, q363PurgeManifest)
}
