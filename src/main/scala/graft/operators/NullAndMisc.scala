package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §2.2/§2.7 fill-ins: the `DataFrameNaFunctions` family
  * (drop/fill/replace) over manufactured nulls, and the date-arithmetic +
  * string functions not yet exercised elsewhere. */
object NullAndMisc {

  /** na.drop / na.fill / na.replace: negative balances → NULL, then each
    * repair strategy side by side. */
  val q86NaOps: GraftQuery = GraftQuery.oracled(
    "q86_na_ops",
    """WITH d AS (SELECT c_custkey,
      |                  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
      |                  c_mktsegment
      |           FROM customer)
      |SELECT c_custkey,
      |       round(coalesce(bal, -1.0), 2) AS bal_filled,
      |       CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUTO' ELSE c_mktsegment END AS seg_replaced,
      |       (bal IS NOT NULL) AS kept_by_drop
      |FROM d
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val withNulls = Tables.customer(spark, dir)
      .select($"c_custkey",
        when($"c_acctbal" < 0, lit(null).cast("double")).otherwise($"c_acctbal").as("bal"),
        $"c_mktsegment")
    val dropped = withNulls.na.drop(Seq("bal")).select($"c_custkey").withColumn("kept", lit(true))
    withNulls
      .na.fill(-1.0, Seq("bal"))
      .na.replace("c_mktsegment", Map("AUTOMOBILE" -> "AUTO"))
      .join(dropped, Seq("c_custkey"), "left_outer")
      .select($"c_custkey",
        RelationalCore.money($"bal").as("bal_filled"),
        $"c_mktsegment".as("seg_replaced"),
        coalesce($"kept", lit(false)).as("kept_by_drop"))
      .orderBy($"c_custkey")
  }

  /** Date arithmetic: interval add/subtract, add_months, last_day,
    * make_date-style reconstruction. */
  val q87DateArith: GraftQuery = GraftQuery.oracled(
    "q87_date_arith",
    """SELECT o_orderkey,
      |       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY  AS plus_30d,
      |       CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS minus_1mo,
      |       last_day(CAST(o_orderdate AS DATE))          AS month_end,
      |       make_date(year(o_orderdate), month(o_orderdate), 1) AS month_first
      |FROM orders
      |WHERE o_orderkey < 200
      |ORDER BY o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 200)
      .select($"o_orderkey",
        date_add($"o_orderdate".cast("date"), 30).cast("timestamp").as("plus_30d"),
        add_months($"o_orderdate".cast("date"), -1).cast("timestamp").as("minus_1mo"),
        last_day($"o_orderdate".cast("date")).cast("timestamp").as("month_end"),
        make_date(year($"o_orderdate"), month($"o_orderdate"), lit(1)).cast("timestamp").as("month_first"))
      .orderBy($"o_orderkey")
  }

  /** Spark-compatible soundex as a DuckDB SQL expression (DuckDB 1.0 has no
    * soundex builtin). Vectorized string ops only — an earlier `list_reduce`
    * fold hit a DuckDB 1.0 vectorization bug that mixed accumulator state
    * across rows (same input string, different output per row). Construction:
    * uppercase; in the tail, map non-letters to '0' (they reset the last-code
    * like vowels) and DELETE H/W (skipped without clearing the last code, so
    * duplicate suppression must see through them); translate letters to the
    * A–Z code map `01230127022455012623017202` with the first letter's code
    * prepended as the suppression seed; collapse runs of identical digits
    * (= emit only on code change); strip '0's (resets emit nothing); drop the
    * surviving seed digit unless the seed was '0' (vowel seeds vanish with the
    * zero-strip); keep first letter + 3 digits zero-padded. Strings not
    * starting with a letter pass through unchanged. Verified against Spark on
    * all 150 q88 rows plus canonical vectors (Robert→R163, Ashcraft→A261,
    * Tymczak→T522, Pfister→P236, Honeyman→H555, Hholmes→H452) and H/W,
    * punctuation, vowel-initial edge cases. */
  private def duckSoundex(col: String): String = {
    val az = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val mp = "01230127022455012623017202"
    val seed = s"translate(upper($col[1:1]), '$az', '$mp')"
    val tail = s"regexp_replace(regexp_replace(upper($col[2:]), '[^A-Z]', '0', 'g'), '[HW]', '', 'g')"
    val codes = s"$seed || translate($tail, '$az', '$mp')"
    val collapsed = "01234567".foldLeft(codes)((acc, d) => s"regexp_replace($acc, '$d+', '$d', 'g')")
    val digits = s"replace($collapsed, '0', '')"
    s"""CASE
       |  WHEN length($col) = 0 THEN $col
       |  WHEN upper($col[1:1]) < 'A' OR upper($col[1:1]) > 'Z' THEN $col
       |  ELSE upper($col[1:1]) || rpad(
       |    CASE WHEN $seed = '0' THEN ($digits)[1:3] ELSE ($digits)[2:4] END, 3, '0')
       |END""".stripMargin
  }

  /** Remaining string family: initcap, reverse, repeat, translate,
    * left/right, soundex (SURVEY.md §2.7). */
  val q88StringExtra: GraftQuery = GraftQuery.oracled(
    "q88_string_extra",
    s"""SELECT p_partkey,
      |       array_to_string(list_transform(string_split(p_name, ' '),
      |         w -> upper(w[1:1]) || w[2:]), ' ') AS name_title,
      |       reverse(p_brand)                AS brand_rev,
      |       repeat(p_type, 2)               AS type_twice,
      |       translate(p_name, 'aeiou', '.....') AS name_dotted,
      |       left(p_name, 3)                 AS name_l3,
      |       right(p_name, 3)                AS name_r3,
      |       ${duckSoundex("p_name").linesIterator.mkString("\n      |       ")} AS name_soundex
      |FROM part
      |WHERE p_partkey < 150
      |ORDER BY p_partkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 150)
      .select($"p_partkey",
        initcap($"p_name").as("name_title"),
        reverse($"p_brand").as("brand_rev"),
        repeat($"p_type", 2).as("type_twice"),
        translate($"p_name", "aeiou", ".....").as("name_dotted"),
        expr("left(p_name, 3)").as("name_l3"),
        expr("right(p_name, 3)").as("name_r3"),
        soundex($"p_name").as("name_soundex"))
      .orderBy($"p_partkey")
  }

  /** Right outer join (the §2.3 mirror of q14's left outer): suppliers
    * right-joined to nation keeps every nation row. */
  val q89RightOuter: GraftQuery = GraftQuery.oracled(
    "q89_right_outer",
    """SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers
      |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name
      |ORDER BY n_nationkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey", "right_outer")
      .groupBy($"n_nationkey", $"n_name")
      .agg(count($"s_suppkey").as("n_suppliers"))
      .orderBy($"n_nationkey")
  }

  /** unionByName with allowMissingColumns: schema-drift-tolerant union
    * (SURVEY.md §2.6/§5.6) — columns align by NAME, the missing column
    * null-fills. */
  val q90UnionByName: GraftQuery = GraftQuery.oracled(
    "q90_union_by_name",
    """SELECT c_custkey AS id, c_mktsegment AS segment, NULL AS priority FROM customer WHERE c_custkey < 50
      |UNION ALL
      |SELECT o_orderkey AS id, NULL AS segment, o_orderpriority AS priority FROM orders WHERE o_orderkey < 50
      |ORDER BY id, segment NULLS FIRST, priority NULLS FIRST""") { (spark, dir) =>
    import spark.implicits._
    // deliberately different column ORDER and a missing column on each side
    val a = Tables.customer(spark, dir).filter($"c_custkey" < 50)
      .select($"c_mktsegment".as("segment"), $"c_custkey".as("id"))
    val b = Tables.orders(spark, dir).filter($"o_orderkey" < 50)
      .select($"o_orderkey".as("id"), $"o_orderpriority".as("priority"))
    a.unionByName(b, allowMissingColumns = true)
      .select($"id", $"segment", $"priority".cast("string").as("priority"))
      .orderBy($"id", $"segment".asc_nulls_first, $"priority".asc_nulls_first)
  }

  /** posexplode (positional generator, §2.11): first-occurrence position of
    * each distinct token per document (1-based). */
  val q91Posexplode: GraftQuery = GraftQuery.oracled(
    "q91_posexplode",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100),
      |pos AS (SELECT doc_id, i AS pos, t[i] AS term
      |        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i))
      |SELECT doc_id, term, min(pos) AS first_pos
      |FROM pos GROUP BY doc_id, term
      |ORDER BY doc_id, term""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 100)
      .select($"doc_id", posexplode(split($"text", " ")))
      .groupBy($"doc_id", $"col".as("term"))
      .agg((min($"pos") + 1).as("first_pos")) // posexplode is 0-based; oracle is 1-based
      .orderBy($"doc_id", $"term")
  }

  /** named_struct → to_json (§2.7 struct family): struct construction and
    * JSON serialization agree byte-for-byte across engines. */
  val q92StructToJson: GraftQuery = GraftQuery.oracled(
    "q92_struct_to_json",
    """SELECT event_id,
      |       CAST(to_json(struct_pack(id := event_id, type := event_type,
      |                                k := CAST(json_extract(props, '$.k') AS INT))) AS VARCHAR) AS json_repr
      |FROM events
      |WHERE event_id < 300
      |ORDER BY event_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_id" < 300)
      .select($"event_id",
        to_json(struct(
          $"event_id".as("id"),
          $"event_type".as("type"),
          get_json_object($"props", "$.k").cast("int").as("k"))).as("json_repr"))
      .orderBy($"event_id")
  }

  /** Unpivot (wide→long reshaping, the inverse of q25's pivot): per-flag
    * money aggregates melt into (flag, metric, val) rows via the native
    * `Dataset.unpivot` — an Expand node, pure map-side 1→3 row expansion
    * after the aggregate, no extra shuffle. Metrics are rounded BEFORE the
    * melt on both sides (the values must be one comparable type). */
  val q119Unpivot: GraftQuery = GraftQuery.oracled(
    "q119_unpivot",
    """WITH agg AS (
      |  SELECT l_returnflag,
      |         round(sum(l_quantity), 2)      AS sum_qty,
      |         round(sum(l_extendedprice), 2) AS sum_price,
      |         round(sum(l_discount), 2)      AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT * FROM (UNPIVOT agg ON sum_qty, sum_price, sum_disc INTO NAME metric VALUE val)
      |ORDER BY l_returnflag, metric""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        RelationalCore.money(sum($"l_quantity")).as("sum_qty"),
        RelationalCore.money(sum($"l_extendedprice")).as("sum_price"),
        RelationalCore.money(sum($"l_discount")).as("sum_disc"))
      .unpivot(Array($"l_returnflag"), Array($"sum_qty", $"sum_price", $"sum_disc"),
        "metric", "val")
      .orderBy($"l_returnflag", $"metric")
  }

  /** In-flight pipeline metrics via `Dataset.observe` — data-quality
    * counters (row count, null count, control totals) accumulated DURING the
    * main job, not by a second scan. At 100 TB a separate validation pass
    * doubles the bill; observe() rides the existing scan as accumulator
    * traffic (driver receives a handful of scalars per named observation).
    * The in-query `require` gates the contract a production job would page
    * on: zero null prices, and the observed row count reconciling with the
    * aggregate's own group counts (observation metrics are exposed after an
    * action, so the frame is materialized once to a noop sink first — the
    * returned frame recomputes deterministically for the driver's action). */
  val q134ObserveMetrics: GraftQuery = GraftQuery.oracled(
    "q134_observe_metrics",
    """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation(s"q134_${System.nanoTime()}")
    val out = Tables.lineitem(spark, dir)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        count(when($"l_extendedprice".isNull, 1)).as("null_prices"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        RelationalCore.money(sum($"l_extendedprice")).as("revenue"))
      .orderBy($"l_returnflag")
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val groupTotal = out.agg(sum($"n")).head.getLong(0)
    require(m("null_prices") == 0L && m("rows_seen") == groupTotal,
      s"observe metrics breached: $m vs group total $groupTotal")
    out
  }

  /** Referential-integrity audit: orphan counts for every foreign key in
    * the star schema in one constraint report — the data-quality gate a
    * warehouse runs after each load. Each constraint is a LEFT ANTI join
    * (null-safe: a NULL FK is not an orphan under SQL FK semantics, so
    * NOT EXISTS and left_anti agree).
    *
    * 100 TB plan: small dimension targets broadcast their key set, so
    * five of the six checks are shuffle-free scans; the one fact-to-fact
    * check (lineitem→orders) shuffles on the join key once. Each audit
    * emits a single count — nothing row-sized leaves the executors. */
  val q151RiAudit: GraftQuery = GraftQuery.oracled(
    "q151_ri_audit",
    """SELECT fk, n_orphans FROM (
      |  SELECT 'customer.nationkey' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
      |    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
      |  UNION ALL SELECT 'lineitem.orderkey', CAST(count(*) AS BIGINT)
      |    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL SELECT 'lineitem.partkey', CAST(count(*) AS BIGINT)
      |    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |  UNION ALL SELECT 'lineitem.suppkey', CAST(count(*) AS BIGINT)
      |    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      |  UNION ALL SELECT 'orders.custkey', CAST(count(*) AS BIGINT)
      |    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL SELECT 'supplier.nationkey', CAST(count(*) AS BIGINT)
      |    FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
      |ORDER BY fk""") { (spark, dir) =>
    import spark.implicits._
    def orphans(fk: String, child: org.apache.spark.sql.DataFrame, childKey: String,
        parent: org.apache.spark.sql.DataFrame, parentKey: String) =
      child.join(parent, child(childKey) === parent(parentKey), "left_anti")
        .agg(count(lit(1)).cast("long").as("n_orphans"))
        .select(lit(fk).as("fk"), $"n_orphans")
    val (c, o, l, p, s, n) = (Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir), Tables.part(spark, dir),
      Tables.supplier(spark, dir), Tables.nation(spark, dir))
    orphans("customer.nationkey", c, "c_nationkey", broadcast(n), "n_nationkey")
      .unionByName(orphans("lineitem.orderkey", l, "l_orderkey", o, "o_orderkey"))
      .unionByName(orphans("lineitem.partkey", l, "l_partkey", p, "p_partkey"))
      .unionByName(orphans("lineitem.suppkey", l, "l_suppkey", broadcast(s), "s_suppkey"))
      .unionByName(orphans("orders.custkey", o, "o_custkey", c, "c_custkey"))
      .unionByName(orphans("supplier.nationkey", s, "s_nationkey", broadcast(n), "n_nationkey"))
      .orderBy($"fk")
  }

  /** Map higher-order functions (§2.7): per event type, roll the hour-of-day
    * histogram into a MAP<hour, n> (`map_from_entries`), total it with
    * `aggregate` over `map_values`, keep above-uniform hours with
    * `map_filter`, derive exact ppm shares with `transform_values`, stitch
    * count+share together with `map_zip_with`, and explode back to rows.
    * Shares are floor(n·10⁶/total) on INTEGER inputs — numerator < 2⁵³, so
    * the double division is exact on both engines. The oracle states the
    * flat-relational equivalent; the map pipeline must round-trip to it.
    *
    * Scale note: the maps live per GROUP (24 entries max), built after the
    * hash aggregation — never a per-row collection; the lambdas are
    * Catalyst HOF expressions evaluated without serialization. */
  val q201MapHofs: GraftQuery = GraftQuery.oracled(
    "q201_map_hofs",
    """WITH h AS (SELECT event_type,
      |                  CAST(extract(hour FROM date_trunc('microseconds', ts)) AS BIGINT) AS hour,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n) AS total FROM h GROUP BY 1)
      |SELECT h.event_type, h.hour, CAST(h.n AS BIGINT) AS n,
      |       CAST(floor(h.n * 1000000.0 / t.total) AS BIGINT) AS ppm
      |FROM h JOIN t USING (event_type)
      |WHERE h.n * 48 >= t.total
      |ORDER BY event_type, hour""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type", hour($"ts").cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(map_from_entries(collect_list(struct($"hour", $"n"))).as("m"))
      .withColumn("total", aggregate(map_values($"m"), lit(0L), (a, v) => a + v))
      .withColumn("keep", map_filter($"m", (_, v) => v * 48 >= col("total")))
      .withColumn("sh", transform_values($"keep",
        (_, v) => floor(v * lit(1000000.0) / col("total")).cast("long")))
      .withColumn("z", map_zip_with($"keep", $"sh",
        (_, n, p) => struct(n.as("n"), p.as("ppm"))))
      .select($"event_type", explode($"z").as(Seq("hour", "s")))
      .select($"event_type", $"hour", $"s.n".as("n"), $"s.ppm".as("ppm"))
      .orderBy($"event_type", $"hour")
  }

  /** Error-safe `try_*` arithmetic (§2.7, ANSI-adjacent surface):
    * `try_divide` nulls on zero divisors, `try_to_number` nulls on parse
    * failure, `try_add` nulls on BIGINT overflow — each oracle'd against
    * the CASE-guarded classic expression, so the NULL-on-error contract is
    * exact (no exceptions, no sentinel values). Divisors/parse failures
    * are derived deterministically from the props payload.
    *
    * Scale note: pure row-local projections; try_* keeps dirty-data
    * pipelines inside whole-stage codegen instead of driver-side
    * exception handling. */
  val q220TryArithmetic: GraftQuery = GraftQuery.oracled(
    "q220_try_arithmetic",
    """WITH e AS (SELECT event_id,
      |                  CAST(floor(value * 100) AS BIGINT) AS cents,
      |                  CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS d,
      |                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |           FROM events WHERE event_id < 3000),
      |s AS (SELECT event_id, cents, d, k,
      |             CASE WHEN k % 7 = 0 THEN 'x' || CAST(k AS VARCHAR)
      |                  ELSE CAST(k AS VARCHAR) END AS k_str
      |      FROM e)
      |SELECT event_id,
      |       CASE WHEN d = 0 THEN NULL ELSE cents / CAST(d AS DOUBLE) END AS safe_div,
      |       TRY_CAST(k_str AS BIGINT) AS parsed_k,
      |       CASE WHEN k > 0 THEN NULL ELSE 9223372036854775807 END AS overflow_sum
      |FROM s
      |ORDER BY event_id""") { (spark, dir) =>
    import spark.implicits._
    val k = get_json_object($"props", "$.k").cast("long")
    Tables.events(spark, dir)
      .filter($"event_id" < 3000)
      .select($"event_id",
        floor($"value" * 100).cast("long").as("cents"),
        (k % 5).as("d"), k.as("k"))
      .withColumn("k_str",
        when($"k" % 7 === 0, concat(lit("x"), $"k".cast("string")))
          .otherwise($"k".cast("string")))
      .select($"event_id",
        try_divide($"cents", $"d".cast("double")).as("safe_div"),
        try_to_number($"k_str", lit("999999999")).cast("long").as("parsed_k"),
        try_add(lit(Long.MaxValue), $"k").as("overflow_sum"))
      .orderBy($"event_id")
  }

  /** CORRUPT-RECORD QUARANTINE — the ingestion dead-letter pattern: parse
    * semi-structured payloads in PERMISSIVE mode with a
    * `columnNameOfCorruptRecord` side channel, route unparseable rows to
    * quarantine instead of failing the job (FAILFAST) or silently
    * nulling them (the default-schema trap). Corruption is synthesized
    * deterministically (every 7th event's JSON loses its closing brace)
    * so the oracle can classify the SAME rows via json_valid. The output
    * proves both routes: quarantine share per event_type in ppm, and the
    * checksum of parsed values over the VALID route only.
    *
    * 100 TB plan: from_json is a map-side projection; the census is one
    * hash-agg. The quarantine WRITE (not materialized here) appends the
    * raw `_corrupt` payloads to a dead-letter path for replay — never
    * lost, never blocking. */
  val q331QuarantineParse: GraftQuery = GraftQuery.oracled(
    "q331_quarantine_parse",
    """WITH raw AS (SELECT event_type,
      |                    CASE WHEN event_id % 7 = 0
      |                         THEN substr(props, 1, len(props) - 1)
      |                         ELSE props END AS payload
      |             FROM events),
      |p AS (SELECT event_type, json_valid(payload) AS ok,
      |             CASE WHEN json_valid(payload)
      |                  THEN CAST(json_extract(payload, '$.k') AS INT) END AS k
      |      FROM raw)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(count(CASE WHEN NOT ok THEN 1 END) AS BIGINT) AS n_quarantined,
      |       CAST(floor(1000000.0 * count(CASE WHEN NOT ok THEN 1 END) / count(*)) AS BIGINT) AS quarantined_ppm,
      |       CAST(sum(CASE WHEN ok THEN k END) AS BIGINT) AS sum_k_valid
      |FROM p
      |GROUP BY event_type
      |ORDER BY event_type""") { (spark, dir) =>
    import spark.implicits._
    val raw = Tables.events(spark, dir)
      .select($"event_type",
        when($"event_id" % 7 === 0, expr("substr(props, 1, length(props) - 1)"))
          .otherwise($"props").as("payload"))
    val parsed = raw.withColumn("p",
      from_json($"payload", "k INT, _corrupt STRING",
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
    val bad = $"p._corrupt".isNotNull
    parsed.groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n_total"),
        count(when(bad, 1)).cast("long").as("n_quarantined"),
        floor(lit(1000000.0) * count(when(bad, 1)) / count(lit(1))).cast("long")
          .as("quarantined_ppm"),
        sum(when(!bad, $"p.k")).cast("long").as("sum_k_valid"))
      .orderBy($"event_type")
  }

  def all: Seq[GraftQuery] = Seq(
    q86NaOps, q87DateArith, q88StringExtra, q89RightOuter, q90UnionByName,
    q91Posexplode, q92StructToJson, q119Unpivot, q134ObserveMetrics,
    q151RiAudit, q201MapHofs, q220TryArithmetic, q299TombstonePurge,
    q331QuarantineParse, q378ExplodeOuter)

  /** `explode_outer` — the generator variant q91's plain explode CANNOT
    * express: rows whose array is EMPTY survive with a NULL element (the
    * LEFT JOIN LATERAL semantics). The input arrays are each doc's rare
    * long tokens (length > 7 — most docs have none), so the outer/inner
    * distinction is load-bearing: plain explode would silently drop the
    * majority of documents from the report. NULL ordering is pinned
    * NULLS FIRST on both engines (they disagree by default — the q-series
    * ordering discipline).
    *
    * 100 TB plan: a per-row projection + generator, no shuffle until the
    * presentation sort; generator output is bounded by the filtered
    * token count. */
  val q378ExplodeOuter: GraftQuery = GraftQuery.oracled(
    "q378_explode_outer",
    """WITH a AS (SELECT doc_id,
      |                  list_filter(string_split(text, ' '), t -> length(t) > 7) AS l
      |           FROM documents WHERE doc_id < 100)
      |SELECT a.doc_id, u.t AS rare_tok
      |FROM a LEFT JOIN LATERAL (SELECT unnest(a.l) AS t) u ON true
      |ORDER BY doc_id, rare_tok NULLS FIRST""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 100)
      .select($"doc_id",
        filter(split($"text", " "), t => length(t) > 7).as("l"))
      .select($"doc_id", explode_outer($"l").as("rare_tok"))
      .orderBy($"doc_id", $"rare_tok".asc_nulls_first)
  }

  /** RIGHT-TO-BE-FORGOTTEN PURGE CASCADE AUDIT — the pre-deletion impact
    * report every privacy pipeline runs before executing erasure: given a
    * tombstone list (customers with md5 coin < 2%), follow the FK cascade
    * customer → orders → lineitem and report, per table, rows to purge,
    * rows kept, and the purge share in ppm; the last row audits the
    * POST-purge state (orphaned orders remaining = 0 — erasure must not
    * create the q151 orphans it audits). Anti-join/semi-join census all
    * the way down: the tombstone set broadcasts, the fact tables never
    * shuffle.
    *
    * 100 TB plan: each cascade level is one broadcast semi/anti join +
    * count — the same plan as executing the delete (a partition-rewrite
    * anti-join), so the audit IS the dry run of the real operation. */
  val q299TombstonePurge: GraftQuery = GraftQuery.oracled(
    "q299_tombstone_purge",
    """WITH ts AS (SELECT c_custkey FROM customer
      |            WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < 20000),
      |po AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM ts)),
      |r AS (
      |  SELECT 'customer' AS tbl,
      |         (SELECT CAST(count(*) AS BIGINT) FROM ts) AS purge_rows,
      |         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS total_rows
      |  UNION ALL
      |  SELECT 'orders',
      |         (SELECT CAST(count(*) AS BIGINT) FROM po),
      |         (SELECT CAST(count(*) AS BIGINT) FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem',
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM po)),
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem))
      |SELECT tbl, purge_rows, total_rows - purge_rows AS kept_rows,
      |       CAST(floor(1000000.0 * purge_rows / total_rows) AS BIGINT) AS purge_ppm,
      |       (SELECT CAST(count(*) AS BIGINT) FROM orders
      |        WHERE o_custkey IN (SELECT c_custkey FROM ts)
      |          AND o_orderkey NOT IN (SELECT o_orderkey FROM po)) AS post_purge_orphans
      |FROM r ORDER BY tbl""") { (spark, dir) =>
    import spark.implicits._
    val tomb = Tables.customer(spark, dir)
      .filter(conv(substring(md5($"c_custkey".cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L < 20000L)
      .select($"c_custkey")
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val purgedOrders = orders.join(broadcast(tomb),
      $"o_custkey" === $"c_custkey", "left_semi")
    def censusRow(tbl: String, purged: org.apache.spark.sql.DataFrame,
        total: org.apache.spark.sql.DataFrame) =
      purged.agg(count(lit(1)).cast("long").as("purge_rows"))
        .crossJoin(total.agg(count(lit(1)).cast("long").as("total_rows")))
        .select(lit(tbl).as("tbl"), $"purge_rows", $"total_rows")
    val purgedLi = li.join(broadcast(purgedOrders.select($"o_orderkey")),
      $"l_orderkey" === $"o_orderkey", "left_semi")
    val r = censusRow("customer", tomb, Tables.customer(spark, dir))
      .unionAll(censusRow("orders", purgedOrders, orders))
      .unionAll(censusRow("lineitem", purgedLi, li))
    // the purge set is closed by construction (po = exactly the orders of
    // tombstoned customers), so the orphan audit is structurally 0 — the
    // column exists to PROVE it, mirroring q298's leak census
    val orphans = purgedOrders
      .join(purgedOrders.select($"o_orderkey".as("pk")),
        $"o_orderkey" === $"pk", "left_anti")
      .agg(count(lit(1)).cast("long").as("post_purge_orphans"))
    r.crossJoin(broadcast(orphans))
      .select($"tbl", $"purge_rows",
        ($"total_rows" - $"purge_rows").as("kept_rows"),
        floor(lit(1000000.0) * $"purge_rows" / $"total_rows")
          .cast("long").as("purge_ppm"),
        $"post_purge_orphans")
      .orderBy($"tbl")
  }
}
