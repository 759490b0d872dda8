package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §2.2 / §2.6 — projection, filter, predicates, conditionals,
  * casts, null handling, distinct, limit/offset, set ops, sample/split.
  *
  * Scale discipline: every query keeps raw-column filters at the leaf (so
  * Catalyst pushes them into the Parquet scan), selects early (column
  * pruning → narrow `ReadSchema`), and ends with a fully deterministic
  * `ORDER BY` for oracle parity.
  */
object RelationalCore {

  /** Money/stat doubles: round on BOTH sides, kept as DOUBLE (never DECIMAL —
    * see GraftQuery scaladoc: DECIMAL outputs hash-mismatch in the driver's
    * pandas-vs-DuckDB compare). Shared by every oracle'd module.
    *
    * Residual risk: this assumes Spark's `round` (HALF_UP on the exact
    * double) and DuckDB's produce bit-identical doubles. A value whose
    * unrounded sums diverge by 1 ULP across engines (float summation order)
    * AND lands exactly on a .xxx5 boundary can still round differently and
    * hash-mismatch via repr(). Empirically green across all oracle'd queries
    * at sf0.01/sf0.1; `tools/oracle_check_strict.py` is the pre-snapshot
    * gate that would surface any boundary case immediately. */
  def money(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c, 2)
  def stat(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c, 4)

  /** TPC-H Q1-shaped pricing summary: scan → pushed filter → hash agg
    * (partial+final, map-side combine for free) → sort. The flagship query
    * (SURVEY.md §7 M0). */
  val q01PricingSummary: GraftQuery = GraftQuery.oracled(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("2001-09-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        money(sum($"l_quantity")).as("sum_qty"),
        money(sum($"l_extendedprice")).as("sum_base_price"),
        money(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("sum_disc_price"),
        money(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"))).as("sum_charge"),
        stat(avg($"l_quantity")).as("avg_qty"),
        stat(avg($"l_extendedprice")).as("avg_price"),
        stat(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + rename + derived column + compound predicates (`isin`,
    * `like`, `between`, boolean algebra) — all pushed to the Parquet scan. */
  val q02ProjectFilter: GraftQuery = GraftQuery.oracled(
    "q02_project_filter",
    """SELECT p_partkey AS part_id, p_name,
      |       upper(p_brand) AS brand_uc,
      |       round(p_retailprice * 1.1, 2) AS marked_up
      |FROM part
      |WHERE p_size BETWEEN 10 AND 20
      |  AND p_type IN ('ECONOMY', 'PROMO')
      |  AND p_name LIKE '%gear%'
      |  AND NOT (p_retailprice < 100.0)
      |ORDER BY part_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size".between(10, 20)
        && $"p_type".isin("ECONOMY", "PROMO")
        && $"p_name".like("%gear%")
        && !($"p_retailprice" < 100.0))
      .select(
        $"p_partkey".as("part_id"), $"p_name",
        upper($"p_brand").as("brand_uc"),
        money($"p_retailprice" * 1.1).as("marked_up"))
      .orderBy($"part_id")
  }

  /** Conditional bucketing (`when/otherwise` ≡ CASE WHEN) + agg per bucket. */
  val q03CaseBuckets: GraftQuery = GraftQuery.oracled(
    "q03_case_buckets",
    """SELECT c_mktsegment,
      |       CASE WHEN c_acctbal < 0 THEN 'debt'
      |            WHEN c_acctbal < 5000 THEN 'mid'
      |            ELSE 'rich' END AS bal_bucket,
      |       count(*) AS n,
      |       round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY c_mktsegment, bal_bucket""") { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .withColumn("bal_bucket",
        when($"c_acctbal" < 0, "debt")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("rich"))
      .groupBy($"c_mktsegment", $"bal_bucket")
      .agg(count(lit(1)).as("n"), money(sum($"c_acctbal")).as("total_bal"))
      .orderBy($"c_mktsegment", $"bal_bucket")
  }

  /** Casts + null handling: `nullif`/`coalesce`/`na.fill` round-trip.
    * Corpus has no nulls (FIXTURES.md), so nulls are manufactured with
    * `nullif` then repaired — exercising the same operators EDA cleaning
    * uses (SURVEY.md §2.2). Note double→int casts are AVOIDED: Spark ANSI
    * truncates while DuckDB rounds; `floor(...)` is the portable spelling. */
  val q04CastsNulls: GraftQuery = GraftQuery.oracled(
    "q04_casts_nulls",
    """SELECT o_orderkey,
      |       CAST(o_orderkey AS VARCHAR) AS key_str,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_repaired,
      |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor
      |FROM orders
      |WHERE o_orderkey < 500
      |ORDER BY o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 500)
      .select(
        $"o_orderkey",
        $"o_orderkey".cast("string").as("key_str"),
        $"o_orderdate".cast("date").as("order_date"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_repaired"),
        floor($"o_totalprice").cast("long").as("price_floor"))
      .orderBy($"o_orderkey")
  }

  /** Distinct pairs (shuffle dedup — at scale this is a hash aggregate on
    * the pair key, partial dedup map-side). */
  val q05Distinct: GraftQuery = GraftQuery.oracled(
    "q05_distinct",
    """SELECT DISTINCT c_mktsegment, c_nationkey
      |FROM customer
      |ORDER BY c_mktsegment, c_nationkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** Deterministic top-N with offset: global sort (range-partitioned exchange
    * at scale → TakeOrderedAndProject here) + unique tie-break key. */
  val q06TopNOffset: GraftQuery = GraftQuery.oracled(
    "q06_topn_offset",
    """SELECT o_orderkey, round(o_totalprice, 2) AS price
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 5""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", money($"o_totalprice").as("price"))
      .offset(5).limit(20)
  }

  /** UNION ALL of two tagged key sets. */
  val q07UnionAll: GraftQuery = GraftQuery.oracled(
    "q07_union_all",
    """SELECT c_custkey, 'automobile' AS tag FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |UNION ALL
      |SELECT c_custkey, 'rich' AS tag FROM customer WHERE c_acctbal > 9000
      |ORDER BY c_custkey, tag""") { (spark, dir) =>
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val auto = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey", lit("automobile").as("tag"))
    val rich = c.filter($"c_acctbal" > 9000).select($"c_custkey", lit("rich").as("tag"))
    auto.union(rich).orderBy($"c_custkey", $"tag")
  }

  /** INTERSECT (set semantics) of two key sets. */
  val q08Intersect: GraftQuery = GraftQuery.oracled(
    "q08_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
      .intersect(c.filter($"c_acctbal" > 5000).select($"c_custkey"))
      .orderBy($"c_custkey")
  }

  /** EXCEPT (set semantics): rich customers outside the AUTOMOBILE segment
    * (chosen over "customers without orders", which is empty at sf≥0.01 —
    * an empty-vs-empty hash match would be a vacuous check). */
  val q09Except: GraftQuery = GraftQuery.oracled(
    "q09_except",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    c.filter($"c_acctbal" > 9000).select($"c_custkey")
      .except(c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey"))
      .orderBy($"c_custkey")
  }

  /** INTERSECT ALL / EXCEPT ALL (multiset semantics) over duplicate-bearing
    * projections — order-priority multisets of two order-status slices. */
  val q10MultisetOps: GraftQuery = GraftQuery.oracled(
    "q10_multiset_ops",
    """SELECT op, count(*) AS n FROM (
      |  SELECT o_orderpriority AS op FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      |) GROUP BY op
      |ORDER BY op""") { (spark, dir) =>
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    o.filter($"o_orderstatus" === "F").select($"o_orderpriority".as("op"))
      .intersectAll(o.filter($"o_orderstatus" === "O").select($"o_orderpriority"))
      .groupBy($"op").agg(count(lit(1)).as("n"))
      .orderBy($"op")
  }

  /** `randomSplit` train/test — split membership is RNG/engine-specific,
    * so since r6 the entry ships PRINT-BOTH (the q29 pattern): the total
    * row count and each split's target fraction are strict-oracle'd, and
    * the sampling CONTRACTS ride as booleans the oracle pins TRUE —
    * `frac_within_5sigma` (q101's binomial-concentration form:
    * |n − f·total| ≤ 5√(total·f(1−f)) + 5 — randomSplit samples per row,
    * so the split size concentrates like a Bernoulli sum) and
    * `splits_exhaustive` (n_train + n_test == total: randomSplit must
    * partition, not sample). ScalaTest still asserts disjointness and
    * seeded reproducibility. */
  val q11SampleSplit: GraftQuery = GraftQuery.oracled(
    "q11_sample_split",
    """SELECT s.split, CAST(s.f AS DOUBLE) AS target_frac,
      |       CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(1 AS BOOLEAN) AS frac_within_5sigma,
      |       CAST(1 AS BOOLEAN) AS splits_exhaustive
      |FROM orders, (SELECT unnest(['test', 'train']) AS split,
      |                     unnest([0.2, 0.8]) AS f) s
      |GROUP BY s.split, s.f
      |ORDER BY s.split""") { (spark, dir) =>
    import spark.implicits._
    val total = Tables.orders(spark, dir).count()
    val Array(train, test) = Tables.orders(spark, dir).randomSplit(Array(0.8, 0.2), seed = 42)
    val counts = train.select(lit("train").as("split"), lit(0.8).as("target_frac"))
      .union(test.select(lit("test"), lit(0.2)))
      .groupBy($"split", $"target_frac").agg(count(lit(1)).as("n"))
    val sum = counts.agg(org.apache.spark.sql.functions.sum($"n").as("n_all"))
    counts.crossJoin(broadcast(sum))
      .select($"split", $"target_frac", lit(total).as("n_total"),
        (abs($"n" - $"target_frac" * total) <=
          lit(5.0) * sqrt(lit(total.toDouble) * $"target_frac" * (lit(1.0) - $"target_frac")) + 5)
          .as("frac_within_5sigma"),
        ($"n_all" === total).as("splits_exhaustive"))
      .orderBy($"split")
  }

  /** Stratified (per-class) sampling via `df.stat.sampleBy` — class-balanced
    * downsampling for training corpora (e.g. cap the dominant language).
    * Bernoulli per row against the stratum's fraction → fully map-side, no
    * shuffle before the reporting agg. Sample membership is RNG-dependent,
    * so since r6 the entry ships PRINT-BOTH (the q29 pattern): per stratum,
    * the population count and target fraction are strict-oracle'd and the
    * Bernoulli CONCENTRATION contract — |n_sampled − f·n| ≤ 5σ + 5 with
    * σ = √(n·f·(1−f)) — rides as a boolean the oracle pins TRUE.
    * ScalaTest still gates ratios and seed-reproducibility. */
  val q101StratifiedSample: GraftQuery = GraftQuery.oracled(
    "q101_stratified_sample",
    """SELECT d.lang,
      |       CAST(count(*) AS BIGINT) AS n_lang,
      |       CAST(CASE WHEN d.lang = 'en' THEN 0.5 ELSE 0.25 END AS DOUBLE) AS target_frac,
      |       CAST(1 AS BOOLEAN) AS sample_within_5sigma
      |FROM documents d
      |GROUP BY d.lang
      |ORDER BY d.lang""") { (spark, dir) =>
    import spark.implicits._
    val fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.25)
    val pop = Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n_lang"))
    val sampled = Tables.documents(spark, dir)
      .stat.sampleBy("lang", fractions, 42L)
      .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
    pop.join(sampled, Seq("lang"), "left")
      .na.fill(0L, Seq("n_sampled"))
      .withColumn("target_frac",
        when($"lang" === "en", 0.5).otherwise(0.25))
      .select($"lang", $"n_lang".cast("long").as("n_lang"), $"target_frac",
        (abs($"n_sampled" - $"target_frac" * $"n_lang") <=
          lit(5.0) * sqrt($"n_lang" * $"target_frac" * (lit(1.0) - $"target_frac")) + 5)
          .as("sample_within_5sigma"))
      .orderBy($"lang")
  }

  /** Deterministic hash-bucket sampling/splits: bucket = first 8 hex digits
    * of md5(key) mod 20; train/valid/test = 80/10/10 by bucket range. The
    * reproducible, engine-portable alternative to `randomSplit` for corpus
    * splits — the assignment is a pure function of the key, so it is stable
    * across runs, partitionings, engines, and data appends (a new doc never
    * moves an old doc's split), and membership can be re-derived by any
    * system that can md5. Fully map-side; exactly oracle-able. */
  val q102HashBucketSplit: GraftQuery = GraftQuery.oracled(
    "q102_hash_bucket_split",
    """SELECT doc_id, bucket,
      |       CASE WHEN bucket < 16 THEN 'train'
      |            WHEN bucket < 18 THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 AS bucket
      |      FROM documents)
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long") % 20).as("bucket"))
      .withColumn("split",
        when($"bucket" < 16, "train").when($"bucket" < 18, "valid").otherwise("test"))
      .orderBy($"doc_id")
  }

  /** Explicit null-ordering semantics + cume_dist: a nullable projection
    * sorted with DESC NULLS LAST and ASC NULLS FIRST spelled out on BOTH
    * engines — load-bearing because the defaults DISAGREE (Spark: NULLS
    * FIRST on ASC; DuckDB: NULLS LAST), so any query sorting a nullable
    * key portably must pin them. cume_dist completes q36's rank family.
    *
    * Scale plan: both global ranks run TWO-PHASE (TwoPhase.rowNumber,
    * bucket = a val_n-monotone bin with nulls pinned to the last bucket —
    * the null-ordering semantics survive binning because NULLS LAST just
    * means "the greatest bucket"): per-bin parallel ranks + bins-sized
    * broadcast offsets, never a single-task global sort. cume_dist is
    * recovered as rn/N — exact here because the event_id tie-break makes
    * the sort key unique, so every row is the last of its peer group. */
  val q192NullOrdering: GraftQuery = GraftQuery.oracled(
    "q192_null_ordering",
    """WITH e AS (SELECT event_id,
      |                  CASE WHEN event_type = 'view' THEN NULL ELSE value END AS val_n,
      |                  CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 7 = 0 THEN NULL
      |                       ELSE CAST(json_extract(props, '$.k') AS BIGINT) % 5 END AS chan
      |           FROM events WHERE event_id < 2000)
      |SELECT event_id, round(val_n, 2) AS val_n, chan,
      |       round(cume_dist() OVER (ORDER BY val_n DESC NULLS LAST, event_id), 6) AS cd,
      |       row_number() OVER (ORDER BY val_n DESC NULLS LAST,
      |                                   chan ASC NULLS FIRST, event_id) AS rn
      |FROM e
      |ORDER BY rn""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val chanRaw = get_json_object($"props", "$.k").cast("long")
    val e = Tables.events(spark, dir)
      .filter($"event_id" < 2000)
      .select($"event_id",
        when($"event_type" === "view", lit(null)).otherwise($"value").as("val_n"),
        when(chanRaw % 7 === 0, lit(null)).otherwise(chanRaw % 5).as("chan"))
    // nulls-last bucket: any finite val_n bins by floor(-val_n) (monotone
    // along DESC), nulls pin to a strictly-greater constant bucket
    val bkt = when($"val_n".isNull, lit(1000000L))
      .otherwise(floor(-$"val_n").cast("long"))
    val ranked = TwoPhase.rowNumber(
      TwoPhase.rowNumber(e, bkt,
        Seq($"val_n".desc_nulls_last, $"event_id"),
        out = "rn_cd", totalOut = Some("n_total")),
      bkt,
      Seq($"val_n".desc_nulls_last, $"chan".asc_nulls_first, $"event_id"),
      out = "rn")
    ranked.select($"event_id", round($"val_n", 2).as("val_n"), $"chan",
      round($"rn_cd".cast("double") / $"n_total", 6).as("cd"),
      $"rn".cast("int").as("rn"))
      .orderBy($"rn")
  }

  /** SKYLINE (Pareto-frontier) QUERY — the preference operator (Börzsönyi
    * et al., ICDE 2001): parts no other part dominates on (cheaper,
    * bigger) — the "show me the non-stupid options" selection behind
    * every price/quality tradeoff screen. The naive formulation is a
    * quadratic NOT EXISTS self-join; the 2-D closed form here is two
    * WINDOW tests over a single price-ordered pass: a part is dominated
    * iff some STRICTLY cheaper part is at least as big (RANGE-to-−1
    * running max on exact integer cents), or some equal-priced part is
    * strictly bigger (per-price partition max). Duplicate (price, size)
    * points tie — neither dominates — and survive together on both
    * engines.
    *
    * 100 TB plan: no self-join, and no global sort either — the dominance
    * test runs on the PRICE CENSUS (one hash-agg row per distinct price
    * carrying the group max), whose exclusive running max is TWO-PHASE
    * (TwoPhase.runningMaxExclusive: per-bin parallel frontier + bins-sized
    * broadcast prefix — skylines compose), then one price-keyed equi-join
    * back to the parts. */
  val q320Skyline: GraftQuery = GraftQuery.oracled(
    "q320_skyline",
    """WITH p AS (SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |                  CAST(p_size AS BIGINT) AS p_size
      |           FROM part),
      |t AS (SELECT p_partkey, price_cents, p_size,
      |             coalesce(max(p_size) OVER (ORDER BY price_cents
      |               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS best_cheaper,
      |             max(p_size) OVER (PARTITION BY price_cents) AS best_equal
      |      FROM p)
      |SELECT p_partkey, price_cents, p_size
      |FROM t
      |WHERE best_cheaper < p_size AND best_equal <= p_size
      |ORDER BY price_cents, p_partkey""") { (spark, dir) =>
    import spark.implicits._
    val p = Tables.part(spark, dir)
      .select($"p_partkey", round($"p_retailprice" * 100).cast("long").as("price_cents"),
        $"p_size".cast("long").as("p_size"))
    // price census: one row per distinct price with its group max; the
    // RANGE-to-−1 frame over prices ≡ ROWS-to-−1 over the census
    val gm = p.groupBy($"price_cents").agg(max($"p_size").as("best_equal"))
    val census = TwoPhase.runningMaxExclusive(gm,
        bucket = floor($"price_cents" / 1000.0),
        sort = Seq($"price_cents"),
        value = $"best_equal",
        out = "bc")
      .withColumn("best_cheaper", coalesce($"bc", lit(-1L)))
    p.join(census, Seq("price_cents"))
      .filter($"best_cheaper" < $"p_size" && $"best_equal" <= $"p_size")
      .select($"p_partkey", $"price_cents", $"p_size")
      .orderBy($"price_cents", $"p_partkey")
  }

  def all: Seq[GraftQuery] = Seq(
    q01PricingSummary, q02ProjectFilter, q03CaseBuckets, q04CastsNulls,
    q05Distinct, q06TopNOffset, q07UnionAll, q08Intersect, q09Except,
    q10MultisetOps, q11SampleSplit, q101StratifiedSample, q102HashBucketSplit,
    q192NullOrdering, q320Skyline)
}
