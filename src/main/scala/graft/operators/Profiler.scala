package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.engine.GraftQuery
import graft.sources.Tables

/** Schema-driven data profiling (SURVEY.md §4 EDA surface): one pass per
  * column producing the row count, null count, exact distinct count and
  * min/max rendered as text — the table-of-contents report every ingestion
  * pipeline emits before a dataset is accepted. The profile query is
  * GENERATED from `df.schema` (type-dispatched rendering), so it works on
  * any table; the oracle spells the same plan out column-by-column.
  *
  * 100 TB plan: each column's profile is one hash aggregate (the distinct
  * count dominates); columns profile independently, so the union fans out
  * as parallel jobs over column-pruned scans — profiling column c reads
  * ONLY column c thanks to parquet projection pushdown. Swap
  * `count(DISTINCT …)` for `approx_count_distinct` per q29 when exactness
  * isn't worth the shuffle. */
object Profiler {

  /** Render a column's min/max as text, dispatching on dtype so both
    * engines format identically (timestamps pinned to seconds precision —
    * plain casts disagree on fractional rendering). */
  private def profileOf(df: DataFrame, name: String): DataFrame = {
    val dt = df.schema(name).dataType
    def render(c: Column): Column = dt match {
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case _ => c.cast("string")
    }
    df.agg(
      count(lit(1)).cast("long").as("n"),
      (count(lit(1)) - count(col(name))).cast("long").as("n_null"),
      countDistinct(col(name)).cast("long").as("n_distinct"),
      render(min(col(name))).as("min_s"),
      render(max(col(name))).as("max_s"))
      .select(lit(name).as("col_name"), col("n"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Full profile of the `events` table, one row per column. */
  val q183ColumnProfile: GraftQuery = GraftQuery.oracled(
    "q183_column_profile",
    """WITH e AS (SELECT event_id, date_trunc('microseconds', ts) AS ts,
      |                  user_id, event_type, value, props
      |           FROM events)
      |SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
      |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
      |       CAST(min(event_id) AS VARCHAR) AS min_s,
      |       CAST(max(event_id) AS VARCHAR) AS max_s FROM e
      |UNION ALL
      |SELECT 'event_type', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(event_type) AS BIGINT),
      |       CAST(count(DISTINCT event_type) AS BIGINT),
      |       min(event_type), max(event_type) FROM e
      |UNION ALL
      |SELECT 'props', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(props) AS BIGINT),
      |       CAST(count(DISTINCT props) AS BIGINT),
      |       min(props), max(props) FROM e
      |UNION ALL
      |SELECT 'ts', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(ts) AS BIGINT),
      |       CAST(count(DISTINCT ts) AS BIGINT),
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') FROM e
      |UNION ALL
      |SELECT 'user_id', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(user_id) AS BIGINT),
      |       CAST(count(DISTINCT user_id) AS BIGINT),
      |       CAST(min(user_id) AS VARCHAR),
      |       CAST(max(user_id) AS VARCHAR) FROM e
      |UNION ALL
      |SELECT 'value', CAST(count(*) AS BIGINT),
      |       CAST(count(*) - count(value) AS BIGINT),
      |       CAST(count(DISTINCT value) AS BIGINT),
      |       CAST(min(value) AS VARCHAR),
      |       CAST(max(value) AS VARCHAR) FROM e
      |ORDER BY col_name""") { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    ev.columns.sorted
      .map(c => profileOf(ev, c))
      .reduce(_ unionByName _)
  }

  /** INCLUSION-DEPENDENCY MINING (FK discovery) — the schema-inference
    * step q151's referential-integrity audit PRESUPPOSES: q151 checks
    * DECLARED foreign keys; this query DISCOVERS them, scoring a candidate
    * grid of column pairs by containment (|distinct(child) ∩
    * distinct(parent)| / |distinct(child)|, the Bell–Brockhausen/Binder
    * unary IND test). Containment 1.0 ⇒ a valid FK candidate; the grid
    * deliberately includes a spurious pair (p_size → n_nationkey, two
    * small-int domains that overlap without meaning) the miner must score
    * below 1.0 — discovery has to REJECT, not just confirm.
    *
    * 100 TB plan: each candidate costs one distinct hash-agg per side
    * (column-pruned parquet scans — only the candidate columns are ever
    * read) and one key-keyed left join on the DISTINCT sets, which are
    * orders of magnitude smaller than the tables; candidates evaluate
    * independently (parallel jobs), and the final table is grid-sized. */
  val q313InclusionDeps: GraftQuery = {
    // (label, child table, child col, parent table, parent col)
    val grid = Seq(
      ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("events.user_id->customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
      ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
      ("part.p_size->nation.n_nationkey", "part", "p_size", "nation", "n_nationkey"),
      ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"))
    val sql = grid.map { case (label, ct, cc, pt, pc) =>
      s"""SELECT '$label' AS candidate,
         |       CAST(count(*) AS BIGINT) AS n_child_distinct,
         |       CAST(count(p.v) AS BIGINT) AS n_contained,
         |       CAST(floor(1000000.0 * count(p.v) / count(*)) AS BIGINT) AS containment_ppm,
         |       CASE WHEN count(p.v) = count(*) THEN 1 ELSE 0 END AS is_inclusion
         |FROM (SELECT DISTINCT CAST($cc AS BIGINT) AS v FROM $ct WHERE $cc IS NOT NULL) c
         |LEFT JOIN (SELECT DISTINCT CAST($pc AS BIGINT) AS v FROM $pt) p USING (v)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
    GraftQuery.oracled("q313_inclusion_deps", sql) { (spark, dir) =>
      import spark.implicits._
      grid.map { case (label, ct, cc, pt, pc) =>
        val c = Tables.table(spark, dir, ct)
          .filter(col(cc).isNotNull).select(col(cc).cast("long").as("v")).distinct()
        val p = Tables.table(spark, dir, pt)
          .select(col(pc).cast("long").as("v")).distinct()
          .withColumn("hit", lit(1))
        c.join(p, Seq("v"), "left")
          .agg(count(lit(1)).cast("long").as("n_child_distinct"),
            count($"hit").cast("long").as("n_contained"),
            floor(lit(1000000.0) * count($"hit") / count(lit(1))).cast("long")
              .as("containment_ppm"),
            when(count($"hit") === count(lit(1)), 1).otherwise(0).as("is_inclusion"))
          .select(lit(label).as("candidate"), $"n_child_distinct", $"n_contained",
            $"containment_ppm", $"is_inclusion")
      }.reduce(_ unionAll _).orderBy($"candidate")
    }
  }

  /** DATA-QUALITY EXPECTATIONS SUITE (the dbt-test / Deequ constraint
    * run): a declared contract — not-null, unique, accepted values,
    * referential integrity, numeric range, sane dates — evaluated in one
    * report of violation counts. q183 DESCRIBES the data; this query
    * JUDGES it against the contract, the gate an ingestion pipeline
    * actually blocks on.
    *
    * 100 TB plan: every check is a filtered/conditional aggregate over a
    * column-pruned scan; the uniqueness check is one hash-agg
    * (count − count distinct), the RI check one key-keyed anti-join of
    * distinct key sets. Checks run independently — a failed one
    * pinpoints its violating rows by construction (the filter IS the
    * violation predicate). */
  val q316Expectations: GraftQuery = GraftQuery.oracled(
    "q316_expectations",
    """SELECT 'accepted_values:l_returnflag' AS check_name,
      |       CAST(count(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) AS BIGINT) AS n_violations
      |FROM lineitem
      |UNION ALL
      |SELECT 'no_future_dates:l_shipdate',
      |       CAST(count(CASE WHEN l_shipdate > TIMESTAMP '2030-01-01 00:00:00' THEN 1 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'not_null:o_custkey',
      |       CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'positive:o_totalprice',
      |       CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'range:l_discount_0_to_0.1',
      |       CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'referential:l_orderkey_in_orders',
      |       CAST((SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
      |             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
      |UNION ALL
      |SELECT 'unique:o_orderkey',
      |       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
      |FROM orders
      |ORDER BY check_name""") { (spark, dir) =>
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val acc = li.agg(count(when(!$"l_returnflag".isin("A", "N", "R"), 1))
      .cast("long").as("n_violations"))
      .select(lit("accepted_values:l_returnflag").as("check_name"), $"n_violations")
    val fut = li.agg(count(when($"l_shipdate" > lit("2030-01-01 00:00:00").cast("timestamp"), 1))
      .cast("long").as("n_violations"))
      .select(lit("no_future_dates:l_shipdate").as("check_name"), $"n_violations")
    val nn = o.agg(count(when($"o_custkey".isNull, 1)).cast("long").as("n_violations"))
      .select(lit("not_null:o_custkey").as("check_name"), $"n_violations")
    val pos = o.agg(count(when($"o_totalprice" <= 0, 1)).cast("long").as("n_violations"))
      .select(lit("positive:o_totalprice").as("check_name"), $"n_violations")
    val rng = li.agg(count(when($"l_discount" < 0 || $"l_discount" > 0.1, 1))
      .cast("long").as("n_violations"))
      .select(lit("range:l_discount_0_to_0.1").as("check_name"), $"n_violations")
    val ri = li.select($"l_orderkey").distinct()
      .join(o.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .select(lit("referential:l_orderkey_in_orders").as("check_name"), $"n_violations")
    val uq = o.agg((count(lit(1)) - countDistinct($"o_orderkey")).cast("long")
      .as("n_violations"))
      .select(lit("unique:o_orderkey").as("check_name"), $"n_violations")
    Seq(acc, fut, nn, pos, rng, ri, uq).reduce(_ unionAll _)
      .orderBy($"check_name")
  }

  /** SKETCH-BASED JOIN-CARDINALITY ESTIMATION (Cormode & Muthukrishnan,
    * J. Algorithms 2005: the count-min inner-product estimate) — the
    * statistic a cost-based planner wants BEFORE executing a join:
    * |R ⋈ S| = Σ_k n_R(k)·n_S(k) is estimated as min_d Σ_b cmsR[d][b]·
    * cmsS[d][b] from two depth×width count grids, never touching the join
    * itself. The sketch here is built RELATIONALLY — a (d, bucket)→count
    * relation via a portable md5 bucket hash — so the whole estimator
    * (both sketches, the per-depth inner products, the min, and the exact
    * truth it brackets) is plain SQL and strictly DuckDB-oracle'd: the
    * output pins overestimate ≥ 0 (CMS never undercounts) and the classic
    * ε·N_R·N_S bound with ε = e/width, checked in-row.
    *
    * 100 TB plan: per-table key censuses are map-side-combined hash aggs;
    * the sketches are depth·width = 4096-row relations (mergeable partials
    * — the streaming/cross-shard form ships per-partition grids and adds
    * them); the inner product joins two 4096-row relations. The exact
    * side here is the small-sf verifier: at scale you'd ship ONLY the
    * sketch path — that is the point of estimating before joining. */
  val q428CmsJoinSize: GraftQuery = GraftQuery.oracled(
    "q428_cms_join_size",
    """WITH ek AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n
      |            FROM events GROUP BY 1),
      |ok AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
      |       FROM orders GROUP BY 1),
      |exact AS (SELECT CAST(sum(ek.n * ok.n) AS BIGINT) AS exact_pairs
      |          FROM ek JOIN ok USING (k)),
      |totals AS (SELECT (SELECT CAST(sum(n) AS BIGINT) FROM ek) AS n1,
      |                  (SELECT CAST(sum(n) AS BIGINT) FROM ok) AS n2),
      |se AS (SELECT d, CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 1024 AS b,
      |              CAST(sum(n) AS BIGINT) AS c
      |       FROM ek, UNNEST(generate_series(0, 3)) AS g(d) GROUP BY 1, 2),
      |so AS (SELECT d, CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % 1024 AS b,
      |              CAST(sum(n) AS BIGINT) AS c
      |       FROM ok, UNNEST(generate_series(0, 3)) AS g(d) GROUP BY 1, 2),
      |ip AS (SELECT se.d, CAST(sum(se.c * so.c) AS BIGINT) AS est_d
      |       FROM se JOIN so ON se.d = so.d AND se.b = so.b GROUP BY se.d),
      |est AS (SELECT CAST(min(est_d) AS BIGINT) AS cms_est FROM ip)
      |SELECT exact_pairs, cms_est,
      |       CAST(cms_est - exact_pairs AS BIGINT) AS overestimate,
      |       CASE WHEN cms_est >= exact_pairs
      |             AND cms_est <= exact_pairs
      |                 + CAST(ceil(2.718281828459045 * n1 * n2 / 1024) AS BIGINT)
      |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bound_ok
      |FROM exact, est, totals""") { (spark, dir) =>
    import spark.implicits._
    def bucket(k: Column, d: Column): Column =
      conv(substring(md5(concat(d.cast("string"), lit(":"), k.cast("string"))),
        1, 12), 16, 10).cast("long") % 1024L
    def sketch(keyed: DataFrame): DataFrame = keyed
      .select(explode(sequence(lit(0), lit(3))).as("d"), $"k", $"n")
      .groupBy($"d", bucket($"k", $"d").as("b"))
      .agg(sum($"n").cast("long").as("c"))
    val ek = Tables.events(spark, dir).groupBy($"user_id".as("k"))
      .agg(count(lit(1)).cast("long").as("n"))
    val ok = Tables.orders(spark, dir).groupBy($"o_custkey".as("k"))
      .agg(count(lit(1)).cast("long").as("n"))
    val exact = ek.join(ok.withColumnRenamed("n", "n2"), "k")
      .agg(sum($"n" * $"n2").cast("long").as("exact_pairs"))
    val totals = ek.agg(sum($"n").cast("long").as("n1"))
      .crossJoin(ok.agg(sum($"n").cast("long").as("n2t")))
    val ip = sketch(ek).alias("se")
      .join(sketch(ok).alias("so"), Seq("d", "b"))
      .groupBy($"d")
      .agg(sum($"se.c" * $"so.c").cast("long").as("est_d"))
    val est = ip.agg(min($"est_d").cast("long").as("cms_est"))
    exact.crossJoin(est).crossJoin(totals)
      .select($"exact_pairs", $"cms_est",
        ($"cms_est" - $"exact_pairs").cast("long").as("overestimate"),
        when($"cms_est" >= $"exact_pairs" &&
          $"cms_est" <= $"exact_pairs" +
            ceil(lit(2.718281828459045) * $"n1" * $"n2t" / 1024).cast("long"),
          1L).otherwise(0L).as("bound_ok"))
  }

  def all: Seq[GraftQuery] = Seq(q183ColumnProfile, q313InclusionDeps,
    q316Expectations, q428CmsJoinSize)
}
