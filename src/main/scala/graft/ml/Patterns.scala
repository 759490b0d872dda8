package graft.ml

import org.apache.spark.ml.fpm.{FPGrowth, PrefixSpan}
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** Pattern mining (SURVEY.md §2.9 surface): frequent itemsets / association
  * rules (FP-Growth; Han, Pei & Yin 2000) and sequential patterns
  * (PrefixSpan; Pei et al. 2001) over per-user behavior — the classic
  * market-basket and clickstream miners.
  *
  * Scale shape: both are the distributed variants Spark ML ships — FP-Growth
  * builds per-partition conditional FP-trees (parallel by item group),
  * PrefixSpan grows prefixes with distributed projected databases. The
  * basket/sequence assembly below is one user-keyed aggregation each; no
  * step enumerates the exponential pattern space eagerly. */
object Patterns {

  /** Per-user click baskets (distinct items, sorted for determinism). */
  private def baskets(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .select($"user_id",
        (get_json_object($"props", "$.k").cast("long") % 20).as("item"))
      .distinct()
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"item")).as("items"))
  }

  /** Frequent itemsets at 20% support over per-user click baskets.
    * PatternsSpec cross-checks every size-1 and size-2 itemset count
    * against exact SQL aggregation (q172's machinery) and the support
    * floor. The itemset is emitted as `to_json` (q182's pattern) so the
    * driver's compare never sees an array-typed column.
    *
    * STRICT since r8 (formerly rows-only): frequent itemsets are a
    * DATA-DETERMINED set — FP-Growth is just one algorithm that finds it —
    * and the itemset lattice IS relationally enumerable by sorted-prefix
    * extension (every frequent itemset's sorted prefix is frequent, so
    * extending each frequent set only by items > its last element is a
    * complete, duplicate-free walk). The DuckDB oracle runs that walk as a
    * recursive CTE with LIST-valued keys, the support floor as the integer
    * cross-mult `5·freq ≥ n` (≡ MLlib's `freq ≥ ceil(0.2·n)`), and emits
    * the identical `to_json`/freq/size rows — verified itemset-for-itemset
    * against the FP-Growth output. */
  val q179FpGrowth: GraftQuery = GraftQuery.oracled(
    "q179_fpgrowth_itemsets",
    """WITH RECURSIVE
      |it0 AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) % 20 AS item
      |        FROM events WHERE event_type = 'click'),
      |b AS (SELECT user_id, list_sort(list(item)) AS items FROM it0 GROUP BY user_id),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      |lev AS (
      |  SELECT [item] AS iset, CAST(count(*) AS BIGINT) AS freq
      |  FROM it0, nb GROUP BY item, nb.n HAVING 5 * count(*) >= nb.n
      |  UNION ALL
      |  SELECT iset, freq FROM (
      |    SELECT list_append(l.iset, u.it) AS iset, CAST(count(*) AS BIGINT) AS freq
      |    FROM lev l
      |    JOIN b ON list_has_all(b.items, l.iset),
      |    UNNEST(list_filter(b.items, x -> x > l.iset[-1])) AS u(it),
      |    nb
      |    GROUP BY list_append(l.iset, u.it), nb.n
      |    HAVING 5 * count(*) >= nb.n
      |  )
      |)
      |SELECT to_json(iset) AS items, freq, CAST(len(iset) AS BIGINT) AS size
      |FROM lev ORDER BY size, iset""") {
    (spark, dir) =>
      import spark.implicits._
      val model = new FPGrowth()
        .setItemsCol("items").setMinSupport(0.2).setMinConfidence(0.5)
        .fit(baskets(spark, dir))
      model.freqItemsets
        .select(sort_array($"items").as("itemsArr"), $"freq")
        .withColumn("size", size($"itemsArr").cast("long"))
        .orderBy($"size", $"itemsArr")
        .select(to_json($"itemsArr").as("items"), $"freq", $"size")
  }

  /** Per-user event-type sequences in (ts, event_id) order, as
    * single-item itemset sequences. */
  private def sequences(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .groupBy($"user_id")
      .agg(transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
        x => array(x.getField("event_type"))).as("sequence"))
  }

  /** Frequent sequential patterns (PrefixSpan, 30% support, length ≤ 3)
    * over per-user event-type sequences. PatternsSpec cross-checks the
    * length-1 patterns against exact distinct-user counts.
    *
    * STRICT since r8 (formerly rows-only): with single-item itemsets, a
    * bounded alphabet (5 event types) and maxPatternLength = 3, the
    * pattern space is ≤ 5 + 25 + 125 candidates — fully enumerable — and
    * subsequence support is decidable by the GREEDY first-occurrence
    * chain (existence of i<j<k with the right symbols ⟺ the greedy chain
    * of first occurrences succeeds). The oracle enumerates all
    * candidates, chains `list_position` through LATERALs per (user,
    * pattern), applies MLlib's support floor as the integer cross-mult
    * 10·freq ≥ 3·n (≡ freq ≥ ceil(0.3·n)), and emits the identical
    * to_json sequence-of-itemsets strings — verified pattern-for-pattern
    * against the PrefixSpan output. */
  val q182PrefixSpan: GraftQuery = GraftQuery.oracled(
    "q182_prefixspan_patterns",
    """WITH u AS (
      |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS l
      |  FROM (SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id, event_type FROM events)
      |  GROUP BY user_id),
      |nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
      |ev AS (SELECT DISTINCT event_type AS e FROM events),
      |cand AS (
      |  SELECT [a.e] AS pat FROM ev a
      |  UNION ALL SELECT [a.e, b.e] FROM ev a, ev b
      |  UNION ALL SELECT [a.e, b.e, c.e] FROM ev a, ev b, ev c),
      |hit AS (
      |  SELECT c.pat, u.user_id
      |  FROM cand c, u,
      |  LATERAL (SELECT coalesce(list_position(u.l, c.pat[1]), 0) AS p1) x1,
      |  LATERAL (SELECT CASE WHEN x1.p1 > 0 AND len(c.pat) >= 2
      |                       THEN coalesce(list_position(u.l[x1.p1+1:], c.pat[2]), 0) ELSE 0 END AS p2) x2,
      |  LATERAL (SELECT CASE WHEN x2.p2 > 0 AND len(c.pat) >= 3
      |                       THEN coalesce(list_position(u.l[x1.p1+x2.p2+1:], c.pat[3]), 0) ELSE 0 END AS p3) x3
      |  WHERE CASE len(c.pat) WHEN 1 THEN x1.p1 > 0 WHEN 2 THEN x2.p2 > 0 ELSE x3.p3 > 0 END),
      |fr AS (SELECT pat, CAST(count(*) AS BIGINT) AS freq FROM hit GROUP BY pat),
      |keep AS (SELECT pat, freq FROM fr, nu WHERE 10 * freq >= 3 * nu.n)
      |SELECT to_json(list_transform(pat, x -> [x])) AS pattern, freq
      |FROM keep ORDER BY pattern""") {
    (spark, dir) =>
      import spark.implicits._
      new PrefixSpan()
        .setMinSupport(0.3).setMaxPatternLength(3)
        .setSequenceCol("sequence")
        .findFrequentSequentialPatterns(sequences(spark, dir))
        .select(to_json($"sequence").as("pattern"), $"freq")
        .orderBy($"pattern")
  }

  private[ml] def basketsForSpec(spark: org.apache.spark.sql.SparkSession,
      dir: String) = baskets(spark, dir)
  private[ml] def sequencesForSpec(spark: org.apache.spark.sql.SparkSession,
      dir: String) = sequences(spark, dir)

  /** EXACT Apriori L1→L2→L3 with directional association rules (Agrawal &
    * Srikant, VLDB 1994) — the driver-verifiable counterpart to q179's
    * FP-Growth (spec-gated) and the step past q172's pair-lift: frequent
    * TRIPLES with anti-monotone sub-pair pruning, then {A,B}→C rules with
    * confidence and lift. Baskets = distinct brands per order (items
    * bounded by the brand domain, 25); support floors are RELATIVE
    * (singles 5%, pairs 2.2%, triples 0.35% — calibrated so each level
    * genuinely prunes at every SF) and evaluated in integer cross-mults
    * (`c·10ᵏ ≥ n·thr`), so the whole lattice walk is BIGINT-exact.
    *
    * 100 TB plan: ONE shuffle assembles per-order brand sets; every
    * lattice level is then a bounded subset EXPLODE (≤ basket³ rows per
    * order, basket ≤ lines/order) folded by a map-side-combined hash-agg
    * on an item-domain-sized key space — no self-join ever touches
    * row-scale data. The L1 prune broadcasts the frequent-item set into
    * an array_intersect on the baskets; the L2 prune and the rule joins
    * run on the AGGREGATED tables (≤ |brands|³ rows) as broadcast
    * semi/equi joins. The n scalar rides a 1-row broadcast (the E3
    * pattern). Lift's single-expression cross-mult
    * (10⁶·sup₃·n, with sup₃ ≥ 0.0035·n at the floor) is BIGINT-safe
    * through ~5·10⁷ baskets — 10⁶·(0.0035·n)·n crosses 2⁶³ near
    * n ≈ 5.1·10⁷, NOT 10⁹; past that, rescale the ppm factor by n
    * before multiplying — noted here so the overflow surface is
    * explicit (bound corrected per round-6 ADVICE). */
  val q472AprioriRules: GraftQuery = GraftQuery.oracled(
    "q472_apriori_rules",
    """WITH ob AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM ob),
      |s1 AS MATERIALIZED (SELECT b, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY 1),
      |l1 AS (SELECT b, c FROM s1, n WHERE c * 100 >= n.n * 5),
      |obf AS MATERIALIZED (SELECT o, b FROM ob WHERE b IN (SELECT b FROM l1)),
      |s2 AS MATERIALIZED (
      |  SELECT a.b ba, b.b bb, CAST(count(*) AS BIGINT) AS c
      |  FROM obf a JOIN obf b ON a.o = b.o AND a.b < b.b GROUP BY 1, 2),
      |l2 AS MATERIALIZED (SELECT ba, bb, c FROM s2, n WHERE c * 1000 >= n.n * 22),
      |s3 AS (SELECT a.b ba, b.b bb, c.b bc, CAST(count(*) AS BIGINT) AS c
      |       FROM obf a JOIN obf b ON a.o = b.o AND a.b < b.b
      |                  JOIN obf c ON a.o = c.o AND b.b < c.b
      |       GROUP BY 1, 2, 3),
      |l3 AS MATERIALIZED (
      |  SELECT s3.ba, s3.bb, s3.bc, s3.c
      |  FROM s3, n
      |  WHERE s3.c * 10000 >= n.n * 35
      |    AND EXISTS (SELECT 1 FROM l2 WHERE l2.ba = s3.ba AND l2.bb = s3.bb)
      |    AND EXISTS (SELECT 1 FROM l2 WHERE l2.ba = s3.ba AND l2.bb = s3.bc)
      |    AND EXISTS (SELECT 1 FROM l2 WHERE l2.ba = s3.bb AND l2.bb = s3.bc)),
      |rules AS (
      |  SELECT ba AS a1, bb AS a2, bc AS cons, c AS sup FROM l3
      |  UNION ALL SELECT ba, bc, bb, c FROM l3
      |  UNION ALL SELECT bb, bc, ba, c FROM l3)
      |SELECT r.a1 AS antecedent_1, r.a2 AS antecedent_2, r.cons AS consequent,
      |       r.sup AS support,
      |       CAST((1000000 * r.sup) // s2.c AS BIGINT) AS conf_ppm,
      |       CAST((1000000 * r.sup * n.n) // (s2.c * s1.c) AS BIGINT) AS lift_ppm
      |FROM rules r
      |JOIN s2 ON s2.ba = r.a1 AND s2.bb = r.a2
      |JOIN s1 ON s1.b = r.cons, n
      |ORDER BY antecedent_1, antecedent_2, consequent""") { (spark, dir) =>
    import spark.implicits._
    // One shuffle to per-order brand sets; every lattice level is then a
    // BOUNDED subset explode (|basket| ≤ lines/order) re-aggregated on an
    // item-domain-sized key — no self-join ever touches row-scale data
    // (the self-join formulation re-evaluated the distinct subtree per
    // side and benched 13 s at sf0.1; this shape is ~1 s).
    // localCheckpoint: seven downstream consumers (n, L1, the pruned
    // baskets, both lattice counts, and the two rule-side broadcasts)
    // would otherwise each re-run the scan+shuffle — the q100 iterative
    // trick applied to a DAG with broadcast fan-out.
    val baskets = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey".as("o"))
      .agg(sort_array(collect_set($"p_brand")).as("bs"))
      .localCheckpoint()
    val n = baskets.agg(count(lit(1)).cast("long").as("n"))
    val s1 = baskets.select(explode($"bs").as("b"))
      .groupBy($"b").agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint() // |brands| rows; read by L1 and the rule join
    val l1 = s1.crossJoin(broadcast(n)).filter($"c" * 100 >= $"n" * 5)
    // L1 prune on the basket arrays (broadcast filter, order preserved)
    val bl1 = baskets.crossJoin(broadcast(
        l1.agg(collect_set($"b").as("keep"))))
      .select(array_sort(array_intersect($"bs", $"keep")).as("bs"))
    val pairs = bl1
      .select($"bs", posexplode($"bs").as(Seq("i", "ba")))
      .select($"bs", $"i", $"ba", posexplode($"bs").as(Seq("j", "bb")))
      .filter($"i" < $"j")
    val s2 = pairs.groupBy($"ba", $"bb").agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint() // ≤|brands|² rows; read by L2 and the rule join
    val l2 = s2.crossJoin(broadcast(n)).filter($"c" * 1000 >= $"n" * 22)
      .select($"ba", $"bb")
    val s3 = pairs
      .select($"i", $"ba", $"j", $"bb", posexplode($"bs").as(Seq("k", "bc")))
      .filter($"j" < $"k")
      .groupBy($"ba", $"bb", $"bc").agg(count(lit(1)).cast("long").as("c"))
    val l3 = s3.crossJoin(broadcast(n)).filter($"c" * 10000 >= $"n" * 35)
      .join(broadcast(l2), Seq("ba", "bb"), "left_semi")
      .join(broadcast(l2.select($"ba", $"bb".as("bc"))), Seq("ba", "bc"), "left_semi")
      .join(broadcast(l2.select($"ba".as("bb"), $"bb".as("bc"))), Seq("bb", "bc"), "left_semi")
      .select($"ba", $"bb", $"bc", $"c")
    val rules = l3.select(explode(array(
        struct($"ba".as("a1"), $"bb".as("a2"), $"bc".as("cons")),
        struct($"ba".as("a1"), $"bc".as("a2"), $"bb".as("cons")),
        struct($"bb".as("a1"), $"bc".as("a2"), $"ba".as("cons")))).as("r"),
        $"c".as("sup"))
      .select($"r.a1".as("a1"), $"r.a2".as("a2"), $"r.cons".as("cons"), $"sup")
    rules
      .join(broadcast(s2.select($"ba".as("a1"), $"bb".as("a2"), $"c".as("sup_ab"))),
        Seq("a1", "a2"))
      .join(broadcast(s1.select($"b".as("cons"), $"c".as("sup_c"))), Seq("cons"))
      .crossJoin(broadcast(n))
      .select($"a1".as("antecedent_1"), $"a2".as("antecedent_2"),
        $"cons".as("consequent"), $"sup".as("support"),
        expr("(1000000 * sup) div sup_ab").cast("long").as("conf_ppm"),
        expr("(1000000 * sup * n) div (sup_ab * sup_c)").cast("long").as("lift_ppm"))
      .orderBy($"antecedent_1", $"antecedent_2", $"consequent")
  }

  def all: Seq[GraftQuery] = Seq(q179FpGrowth, q182PrefixSpan, q472AprioriRules)
}
