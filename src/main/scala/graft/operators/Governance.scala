package graft.operators

import org.apache.spark.sql.Column
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

  /** RETENTION-POLICY AUDIT WITH LEGAL HOLD — the OTHER deletion regime
    * next to q299's request-driven RTBF cascade: a TIME-based retention
    * rule (events older than the 2024-01-15 cutoff are purgeable) with a
    * LEGAL-HOLD exemption (users under litigation hold — the md5-coin 3%
    * slice — are retained regardless; deleting held data is itself a
    * violation). Per event type: purgeable rows, rows saved by holds,
    * rows inside the window, and the reclaim share — the numbers a
    * retention job logs before touching storage, and the hold-override
    * count a compliance review asks for explicitly.
    *
    * 100 TB plan: the age predicate prunes date-partitioned storage
    * (q83's layout) before any read; the hold set is user-keyed and tiny
    * (broadcast — here a pure coin of user_id, zero joins); the report is
    * one map-side-combined census. */
  val q363RetentionAudit: GraftQuery = GraftQuery.oracled(
    "q363_retention_audit",
    """WITH e AS (SELECT event_type,
      |                  date_trunc('microseconds', ts) < TIMESTAMP '2024-01-15 00:00:00' AS aged,
      |                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < 30000 AS held
      |           FROM events)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(CASE WHEN aged AND NOT held THEN 1 END) AS BIGINT) AS purgeable,
      |       CAST(count(CASE WHEN aged AND held THEN 1 END) AS BIGINT) AS hold_retained,
      |       CAST(count(CASE WHEN NOT aged THEN 1 END) AS BIGINT) AS in_window,
      |       CAST(1000000 * count(CASE WHEN aged AND NOT held THEN 1 END) // count(*) AS BIGINT) AS reclaim_ppm
      |FROM e
      |GROUP BY event_type
      |ORDER BY event_type""") { (spark, dir) =>
    import spark.implicits._
    val aged = $"ts" < lit("2024-01-15 00:00:00").cast("timestamp")
    val held = conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L < 30000L
    Tables.events(spark, dir)
      .select($"event_type", aged.as("aged"), held.as("held"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n_events"),
        count(when($"aged" && !$"held", 1)).cast("long").as("purgeable"),
        count(when($"aged" && $"held", 1)).cast("long").as("hold_retained"),
        count(when(!$"aged", 1)).cast("long").as("in_window"),
        expr("(1000000 * count(CASE WHEN aged AND NOT held THEN 1 END)) div count(1)")
          .cast("long").as("reclaim_ppm"))
      .orderBy($"event_type")
  }

  /** The md5-derived 16-digit candidate run for q427 (leftmost digit
    * first): hex char i of md5(key) reduced mod 10. The md5 is hashed
    * ONCE and the transform indexes into the result — inlining it in the
    * lambda re-hashes per element (16×/row), the q105 redundancy class
    * (measured 5.8 s → sub-second forced at sf0.1 from this hoist). */
  private[graft] def candidateDigits(key: Column): Column = {
    val h = md5(key.cast("string"))
    transform(sequence(lit(1), lit(16)),
      i => conv(h.substr(i, lit(1)), 16, 10).cast("long") % 10L)
  }

  /** Luhn mod-10 validity (ISO/IEC 7812) of a digit array, leftmost digit
    * first, rightmost the check digit: double every second digit counted
    * from the right, subtract 9 when the double exceeds 9, and require the
    * total ≡ 0 (mod 10). Pure HOF arithmetic — stays inside codegen. */
  private[graft] def luhnValid(ds: Column): Column = {
    val n = size(ds)
    (aggregate(
      zip_with(ds, sequence(lit(1), n), (d, i) =>
        when((n - i) % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
      lit(0L), (acc, x) => acc + x) % 10) === 0
  }

  /** STRUCTURED-PII DETECTION: Luhn-checksum validation (ISO/IEC 7812 —
    * the mod-10 check every payment-card number satisfies) over candidate
    * 16-digit runs, the filter that separates plausible PANs from random
    * digit noise in a PII scrub. The corpus carries no digit runs, so the
    * candidates are a deterministic md5-derived fixture column (the repo's
    * md5-coin pattern, built identically in both engines); the component
    * under test is the pure-relational Luhn kernel — digits via
    * `transform(sequence(...))` + the double-every-second-from-the-right
    * fold via `aggregate` — all inside codegen, zero UDFs. Census per
    * market segment: candidates scanned, Luhn-valid hits (≈10% of random
    * runs by construction of the check), hit rate in ppm.
    *
    * 100 TB plan: per-row bounded HOF arithmetic (16 iterations) fused
    * into the scan projection, then one map-side-combined census agg —
    * the same shape a regex+checksum PII pass has over raw text: no
    * shuffle beyond the segment-sized rollup. */
  val q427LuhnPii: GraftQuery = GraftQuery.oracled(
    "q427_luhn_pii",
    """WITH cand AS (
      |  SELECT c_mktsegment,
      |         list_transform(generate_series(1, 16),
      |           i -> CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), i, 1)) AS BIGINT) % 10) AS ds
      |  FROM customer),
      |chk AS (
      |  SELECT c_mktsegment,
      |         list_sum(list_transform(generate_series(1, 16),
      |           i -> CASE WHEN (16 - i) % 2 = 1
      |                     THEN CASE WHEN 2 * ds[i] > 9 THEN 2 * ds[i] - 9 ELSE 2 * ds[i] END
      |                     ELSE ds[i] END)) % 10 = 0 AS luhn_ok
      |  FROM cand)
      |SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS n_candidates,
      |       CAST(count(CASE WHEN luhn_ok THEN 1 END) AS BIGINT) AS n_luhn_valid,
      |       CAST(1000000 * count(CASE WHEN luhn_ok THEN 1 END) // count(*) AS BIGINT) AS hit_ppm
      |FROM chk
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""") { (spark, dir) =>
    import spark.implicits._
    // hash once per row in its own projection (CollapseProject keeps a
    // multi-referenced expensive alias separate), then index 16× into it
    Tables.customer(spark, dir)
      .select($"c_mktsegment", md5($"c_custkey".cast("string")).as("h"))
      .select($"c_mktsegment",
        luhnValid(transform(sequence(lit(1), lit(16)),
          i => conv($"h".substr(i, lit(1)), 16, 10).cast("long") % 10L))
          .as("luhn_ok"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).cast("long").as("n_candidates"),
        count(when($"luhn_ok", 1)).cast("long").as("n_luhn_valid"),
        expr("(1000000 * count(CASE WHEN luhn_ok THEN 1 END)) div count(1)")
          .cast("long").as("hit_ppm"))
      .orderBy($"c_mktsegment")
  }

  /** T-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the privacy
    * gate k-anonymity (q351) can't see: a QI class can be large AND
    * diverse yet still leak because its SENSITIVE-value distribution
    * differs sharply from the table's. For the ordered sensitive
    * attribute (global account-balance decile via integer rank), the
    * distance is the Earth Mover's Distance over ordered categories —
    * Σ|cumP − cumQ|/(m−1) — computed in PURE BIGINT ppm:
    * (10⁶·Σ|c_k·N − C_k·n|) div (n·N·(m−1)), so the report hashes
    * identically cross-engine. Emits the 20 worst classes. (BIGINT
    * headroom: 10⁶·m·n·N needs N ≲ 10⁶ rows — widen the numerator to
    * DECIMAL(38,0) past that, the q362 discipline.)
    *
    * 100 TB plan: the global decile rank runs TWO-PHASE
    * (TwoPhase.rowNumber — per-bin parallel ranks + bins-sized broadcast
    * offsets, never a single-task customer sort); then one
    * (class × decile) census, cum sums over the 10-bucket census per
    * class — everything after the first agg is census algebra. */
  val q456TCloseness: GraftQuery = GraftQuery.oracled(
    "q456_t_closeness",
    """WITH s AS (SELECT c_nationkey, c_mktsegment,
      |                  ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS dec
      |           FROM customer),
      |cls AS (SELECT c_nationkey, c_mktsegment, dec,
      |               CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2, 3),
      |gdec AS (SELECT dec, CAST(count(*) AS BIGINT) AS g FROM s GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS bign FROM s),
      |grid AS (SELECT q.c_nationkey, q.c_mktsegment, q.n, d.dec,
      |                coalesce(cls.c, 0) AS c, d.g
      |         FROM (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      |               FROM s GROUP BY 1, 2) q
      |         CROSS JOIN gdec d
      |         LEFT JOIN cls ON cls.c_nationkey = q.c_nationkey
      |           AND cls.c_mktsegment = q.c_mktsegment AND cls.dec = d.dec),
      |cum AS (SELECT c_nationkey, c_mktsegment, n, dec,
      |               sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment
      |                            ORDER BY dec) AS cc,
      |               sum(g) OVER (PARTITION BY c_nationkey, c_mktsegment
      |                            ORDER BY dec) AS cg
      |        FROM grid),
      |emd AS (SELECT c_nationkey, c_mktsegment, n,
      |               CAST((1000000 * sum(abs(cc * bign - cg * n))) // (n * bign * 9) AS BIGINT) AS emd_ppm
      |        FROM cum, tot
      |        WHERE dec < 10
      |        GROUP BY c_nationkey, c_mktsegment, n, bign)
      |SELECT c_nationkey, c_mktsegment, n, emd_ppm
      |FROM emd ORDER BY emd_ppm DESC, c_nationkey, c_mktsegment LIMIT 20""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // two-phase global decile rank (bucket = a balance-monotone bin):
    // per-bin parallel ranks + bins-sized broadcast offsets — never a
    // single-task customer sort
    val s = TwoPhase.rowNumber(
        Tables.customer(spark, dir)
          .select($"c_nationkey", $"c_mktsegment", $"c_acctbal", $"c_custkey"),
        bucket = floor($"c_acctbal" / 100.0),
        sort = Seq($"c_acctbal", $"c_custkey"),
        out = "rn", totalOut = Some("n_total"))
      .select($"c_nationkey", $"c_mktsegment",
        TwoPhase.ntileFromRn($"rn", $"n_total", 10).as("dec"))
    val cls = s.groupBy($"c_nationkey", $"c_mktsegment", $"dec")
      .agg(count(lit(1)).cast("long").as("c"))
    val glob = s.groupBy($"dec").agg(count(lit(1)).cast("long").as("g"))
    val tot = s.agg(count(lit(1)).cast("long").as("bign"))
    val q = s.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).cast("long").as("n"))
    val grid = q.crossJoin(broadcast(glob))
      .join(cls, Seq("c_nationkey", "c_mktsegment", "dec"), "left")
      .select($"c_nationkey", $"c_mktsegment", $"n", $"dec",
        coalesce($"c", lit(0L)).as("c"), $"g")
    val w = Window.partitionBy($"c_nationkey", $"c_mktsegment").orderBy($"dec")
    grid
      .withColumn("cc", sum($"c").over(w))
      .withColumn("cg", sum($"g").over(w))
      .filter($"dec" < 10)
      .crossJoin(broadcast(tot))
      .groupBy($"c_nationkey", $"c_mktsegment", $"n", $"bign")
      .agg(expr("(1000000 * sum(abs(cc * bign - cg * n))) div (n * bign * 9)")
        .cast("long").as("emd_ppm"))
      .select($"c_nationkey", $"c_mktsegment", $"n", $"emd_ppm")
      .orderBy($"emd_ppm".desc, $"c_nationkey", $"c_mktsegment")
      .limit(20)
  }

  /** ε-DIFFERENTIALLY-PRIVATE COUNT RELEASE (Dwork et al. 2006's Laplace
    * mechanism) — the statistics-publication gate: per (lang, source)
    * cell, the released count is n + Laplace(1/ε) with ε = 1, the noise
    * drawn by inverse-CDF over the md5 RANDOM ORACLE of the cell key
    * (u = 60-bit md5 prefix / 2⁶⁰; X = −sgn(u−½)·ln(1−2|u−½|)/ε) — the
    * repo's hash-as-randomness trick, so both engines draw the IDENTICAL
    * noise and the release is strict-oracle'd end to end. The true count
    * rides alongside as the small-sf verifier (q253's "exists for honesty
    * and drops at scale" — a production DP release obviously never ships
    * the true column, and redraws the oracle per release epoch).
    *
    * 100 TB plan: one map-side-combined census + a pure projection —
    * noise is a function of the CELL KEY, so no per-row work and no
    * driver RNG state; the release is cells-sized. */
  val q468DpRelease: GraftQuery = GraftQuery.oracled(
    "q468_dp_release",
    """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_true
      |           FROM documents GROUP BY 1, 2),
      |u AS (SELECT lang, source, n_true,
      |             CAST(('0x' || substr(md5(lang || '|' || source), 1, 15)) AS BIGINT)
      |               / 1152921504606846976.0 AS u
      |      FROM c)
      |SELECT lang, source, n_true,
      |       round(n_true - (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
      |             * ln(1 - 2 * abs(u - 0.5)), 4) AS n_released
      |FROM u
      |ORDER BY lang, source""") { (spark, dir) =>
    import spark.implicits._
    val u = conv(substring(md5(concat($"lang", lit("|"), $"source")), 1, 15), 16, 10)
      .cast("double") / 1152921504606846976.0
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).cast("long").as("n_true"))
      .withColumn("u", u)
      .select($"lang", $"source", $"n_true",
        round($"n_true" - when($"u" >= 0.5, 1.0).otherwise(-1.0)
          * log(lit(1.0) - lit(2.0) * abs($"u" - 0.5)), 4).as("n_released"))
      .orderBy($"lang", $"source")
  }

  /** PII REDACTION — the write-side twin of q427's detection: email and
    * E.164-ish phone patterns are regexp-replaced with typed placeholder
    * tags before any export, with per-document replacement counts and the
    * redacted text itself strict-compared (both regex dialects — Java and
    * RE2 — agree on these character-class-only patterns; no backrefs, no
    * lookaround, by design). PII spans are SYNTHESIZED deterministically
    * into the clean driver corpus (the q377/q484 pattern) so every arm —
    * email-only, phone-only, both, neither — fires.
    *
    * 100 TB plan: one regexp projection inside whole-stage codegen per
    * document, no shuffle before the reporting ORDER BY; production runs
    * this in the same scan as quality scoring (q52/q485). */
  val q489PiiRedaction: GraftQuery = GraftQuery.oracled(
    "q489_pii_redaction",
    """WITH r AS (SELECT doc_id,
      |                  text || CASE WHEN doc_id % 3 = 0
      |                               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |                               ELSE '' END
      |                       || CASE WHEN doc_id % 4 = 0
      |                               THEN ' call +1555' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
      |                               ELSE '' END AS raw
      |           FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(raw, '\+[0-9]{10,14}')) AS BIGINT) AS n_phones,
      |       regexp_replace(regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |                      '\+[0-9]{10,14}', '<PHONE>', 'g') AS redacted
      |FROM r ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+[0-9]{10,14}"
    val raw = concat($"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
        .otherwise(""),
      when($"doc_id" % 4 === 0,
        concat(lit(" call +1555"), lpad(($"doc_id" % 10000000).cast("string"), 7, "0")))
        .otherwise(""))
    Tables.documents(spark, dir)
      .select($"doc_id", raw.as("raw"))
      .select($"doc_id",
        regexp_count($"raw", lit(emailRe)).cast("long").as("n_emails"),
        regexp_count($"raw", lit(phoneRe)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace($"raw", emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"))
      .orderBy($"doc_id")
  }

  /** DIFFERENTIALLY-PRIVATE QUANTILES via the EXPONENTIAL MECHANISM
    * (McSherry & Talwar 2007; the quantile instantiation of Smith 2011) —
    * q468's Laplace-count sibling for ORDER statistics, where additive
    * noise doesn't work: utility(v) = −|rank(v) − q·n| over the value
    * census, selection by the Gumbel-max trick (argmax of ε·u/2 + Gumbel),
    * with the Gumbel draws derived from the md5 of (quantile, value) — the
    * q468 portable-randomness pattern, so BOTH engines draw the identical
    * noise and the release is strict-verifiable. Output: per target
    * quantile, the released value, its true rank error, and n.
    *
    * 100 TB plan: one value-census hash-agg over the scan (the only
    * corpus-scale pass), then all mechanism work on the ≤|domain| census
    * rows; the argmax is a census-keyed TakeOrdered, never a collect. */
  val q491DpQuantileEm: GraftQuery = GraftQuery.oracled(
    "q491_dp_quantile_em",
    """WITH cen AS (SELECT CAST(l_quantity AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
      |             FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cen),
      |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM cen),
      |grid AS (SELECT unnest([25, 50, 75]) AS qpct),
      |sc AS (SELECT qpct, v, -abs(cum - (tot.n * qpct) // 100) AS u, tot.n AS n,
      |              CAST(('0x' || substr(md5(CAST(qpct AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT)
      |                / 1152921504606846976.0 AS unif
      |       FROM cum, grid, tot),
      |pick AS (SELECT qpct, v, u, n,
      |                row_number() OVER (PARTITION BY qpct
      |                                   ORDER BY u * 1048576 + CAST(floor(20.0 * (-ln(-ln(unif))) * 1048576.0) AS BIGINT) DESC, v) AS rk
      |         FROM sc)
      |SELECT CAST(qpct AS BIGINT) AS qpct, v AS released_value,
      |       CAST(abs(u) AS BIGINT) AS rank_error, n AS n_rows
      |FROM pick WHERE rk = 1 ORDER BY qpct""") { (spark, dir) =>
    import spark.implicits._
    val cen = Tables.lineitem(spark, dir)
      .groupBy($"l_quantity".cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("c"))
    val cum = cen.select($"v", $"c")
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window.orderBy($"v")).cast("long"))
    val tot = cen.agg(sum($"c").cast("long").as("n"))
    val grid = Seq(25L, 50L, 75L).toDF("qpct")
    val scored = cum.crossJoin(broadcast(grid)).crossJoin(broadcast(tot))
      .withColumn("u", -abs($"cum" - expr("(n * qpct) div 100")))
      .withColumn("unif",
        conv(substring(md5(concat($"qpct".cast("string"), lit(":"), $"v".cast("string"))), 1, 15), 16, 10)
          .cast("double") / 1152921504606846976.0)
      // INTEGER-QUANTIZED score (round-7 advice): ranking by the raw double
      // 0.05*u − ln(−ln(unif)) lets a 1-ulp libm-vs-Math.log difference flip
      // a near-tie between engines. Multiply the order-preserving form
      // 20×score = u + 20·Gumbel by 2^20 and floor the noise term to a
      // BIGINT, so both engines compare exact integers with a deterministic
      // v tie-break; a cross-engine flip now needs the transcendental to
      // land within 1 ulp of a quantization boundary AND within one unit of
      // the argmax — not merely a close race.
      .withColumn("score",
        $"u" * lit(1048576L) +
          floor(lit(20.0) * -log(-log($"unif")) * lit(1048576.0)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qpct").orderBy($"score".desc, $"v")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"qpct", $"v".as("released_value"),
        abs($"u").cast("long").as("rank_error"), $"n".as("n_rows"))
      .orderBy($"qpct")
  }

  def all: Seq[GraftQuery] = Seq(q351KAnonymity, q363RetentionAudit, q427LuhnPii,
    q456TCloseness, q468DpRelease, q489PiiRedaction, q491DpQuantileEm)
}
