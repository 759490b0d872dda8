package graft.llm

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** Text-retrieval primitives over the `documents` corpus: BM25 relevance
  * scoring, the ranking function behind virtually every keyword search
  * engine (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond").
  *
  * Scale shape: one tokenize scan feeds three aggregates — per-doc term
  * frequency (grouped on (doc_id, term)), per-term document frequency, and
  * per-doc length. df and the corpus stats (N, avgdl) are vocabulary-sized /
  * scalar and broadcast; the per-doc score is then a projection plus one
  * `doc_id`-keyed sum. Nothing quadratic, nothing collected: at 100 TB this
  * is two passes over (doc_id, term) pairs for the query's terms only —
  * the `term IN (…)` predicate prunes the tf branch to the query terms
  * before the shuffle. */
object Search {

  private val terms = Seq("spark", "window", "merge")

  /** BM25 (k1 = 1.2, b = 0.75) score of every document matching any query
    * term, oracle'd float-for-float against DuckDB computing the identical
    * expression. IDF uses the non-negative ln(1 + (N − df + ½)/(df + ½))
    * variant. Output is the full scored set ordered by doc_id (top-k
    * retrieval is `orderBy(desc("bm25"), $"doc_id").limit(k)` away; the
    * catalog keeps the deterministic full set so rounding can never flip
    * membership). */
  val q159Bm25: GraftQuery = GraftQuery.oracled(
    "q159_bm25_scoring",
    """WITH tok AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |    FROM documents)
      |  WHERE t <> ''),
      |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM tok
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      |df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1)
      |SELECT tf.doc_id AS doc_id,
      |       round(sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
      |                 * tf.tf * 2.2
      |                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4) AS bm25
      |FROM tf JOIN df ON tf.t = df.t JOIN dl ON tf.doc_id = dl.doc_id, st
      |GROUP BY tf.doc_id
      |ORDER BY tf.doc_id""") { (spark, dir) =>
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t" =!= "")
    val dl = tok.groupBy($"doc_id")
      .agg(count(lit(1)).cast("double").as("dl"))
    val st = dl.agg(
      count(lit(1)).cast("double").as("n"), avg($"dl").as("avgdl"))
    val hits = tok.filter($"t".isin(terms: _*))
    val tf = hits.groupBy($"doc_id", $"t")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = hits.groupBy($"t")
      .agg(countDistinct($"doc_id").cast("double").as("df"))
    tf.join(broadcast(df), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("contrib",
        log(lit(1) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)) *
          $"tf" * 2.2 /
          ($"tf" + lit(1.2) * (lit(0.25) + $"dl" * 0.75 / $"avgdl")))
      .groupBy($"doc_id")
      .agg(round(sum($"contrib"), 4).as("bm25"))
      .orderBy($"doc_id")
  }

  /** Conjunctive (AND) boolean retrieval: documents containing EVERY query
    * term, via inverted-index intersection — distinct postings grouped by
    * doc with a `count = |terms|` gate, the streamable form of k-way list
    * intersection (no join chain, no per-term pass).
    *
    * Scale shape: one tokenize scan → distinct (doc, term) postings for the
    * query's terms only (the `isin` prunes before the distinct's shuffle) →
    * one doc-keyed count. Adding terms changes the gate constant, not the
    * plan depth. */
  val q166BooleanRetrieval: GraftQuery = GraftQuery.oracled(
    "q166_boolean_retrieval",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |    FROM documents)
      |  WHERE t IN ('spark', 'window', 'merge')),
      |hit AS (SELECT doc_id FROM tok GROUP BY doc_id HAVING count(*) = 3)
      |SELECT h.doc_id AS doc_id, d.n_chars
      |FROM hit h JOIN documents d USING (doc_id)
      |ORDER BY h.doc_id""") { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val postings = docs
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t".isin(terms: _*))
      .distinct()
    val hits = postings.groupBy($"doc_id").count()
      .filter($"count" === terms.size)
      .select($"doc_id")
    hits.join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .orderBy($"doc_id")
  }

  /** RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher 2009): the
    * standard hybrid-retrieval combiner — each ranker contributes
    * 1/(60 + rank), which rewards agreement near the top without needing
    * score calibration across models. Fused here: BM25 (q159's exact
    * expression) and Dirichlet-smoothed query likelihood (Zhai & Lafferty
    * 2004; μ = 2000, P(t|C) = cf/|C| — a genuinely different retrieval
    * model, the LM school vs the probabilistic school). Both scores are
    * ROUNDED before ranking so cross-engine float jitter can never flip
    * adjacent ranks; remaining ties break by doc_id on both sides.
    *
    * 100 TB plan: the candidate set is bounded by the query terms'
    * postings, not the corpus — but a hot term's postings can still be
    * corpus-scale, so BOTH rank assignments run TWO-PHASE
    * (TwoPhase.rowNumber, bucket = a score-monotone bin over the rounded
    * scores): per-bin parallel ranks + bins-sized broadcast offsets, never
    * a single-task candidate sort (production additionally top-K's each
    * ranker first via TopKPerGroup — RRF only needs each ranker's top k).
    * The QL smoothing grid is candidates × |query| rows — linear. */
  val q278RrfFusion: GraftQuery = GraftQuery.oracled(
    "q278_rrf_fusion",
    """WITH tok AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |    FROM documents)
      |  WHERE t <> ''),
      |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
      |ctot AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM tok),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM tok
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      |df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1),
      |cf AS (SELECT t, CAST(count(*) AS DOUBLE) AS cf FROM tok
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1),
      |bm AS (SELECT tf.doc_id,
      |              round(sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
      |                        * tf.tf * 2.2
      |                        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4) AS bm25
      |       FROM tf JOIN df ON tf.t = df.t JOIN dl ON tf.doc_id = dl.doc_id, st
      |       GROUP BY tf.doc_id),
      |cand AS (SELECT DISTINCT doc_id FROM tf),
      |grid AS (SELECT cand.doc_id, cf.t, cf.cf, coalesce(tf.tf, 0) AS tf
      |         FROM cand CROSS JOIN cf
      |         LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.t = cf.t),
      |ql AS (SELECT g.doc_id,
      |              round(sum(ln((g.tf + 2000 * g.cf / ctot.c) / (dl.dl + 2000))), 6) AS ql
      |       FROM grid g JOIN dl ON g.doc_id = dl.doc_id, ctot
      |       GROUP BY g.doc_id),
      |ra AS (SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bm),
      |rb AS (SELECT doc_id, ql, row_number() OVER (ORDER BY ql DESC, doc_id) AS r FROM ql)
      |SELECT ra.doc_id AS doc_id,
      |       CAST(ra.r AS BIGINT) AS rank_bm25, CAST(rb.r AS BIGINT) AS rank_ql,
      |       round(CAST(1.0 AS DOUBLE) / (60 + ra.r) + CAST(1.0 AS DOUBLE) / (60 + rb.r), 6) AS rrf
      |FROM ra JOIN rb ON ra.doc_id = rb.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t" =!= "")
    val dl = tok.groupBy($"doc_id")
      .agg(count(lit(1)).cast("double").as("dl"))
    val st = dl.agg(
      count(lit(1)).cast("double").as("n"), avg($"dl").as("avgdl"))
    val ctot = tok.agg(count(lit(1)).cast("double").as("c"))
    val hits = tok.filter($"t".isin(terms: _*))
    val tf = hits.groupBy($"doc_id", $"t")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = hits.groupBy($"t")
      .agg(countDistinct($"doc_id").cast("double").as("df"))
    val cfT = hits.groupBy($"t")
      .agg(count(lit(1)).cast("double").as("cf"))
    val bm = tf.join(broadcast(df), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("contrib",
        log(lit(1) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)) *
          $"tf" * 2.2 /
          ($"tf" + lit(1.2) * (lit(0.25) + $"dl" * 0.75 / $"avgdl")))
      .groupBy($"doc_id")
      .agg(round(sum($"contrib"), 4).as("bm25"))
    val cand = tf.select($"doc_id").distinct()
    val grid = cand.crossJoin(broadcast(cfT))
      .join(tf, Seq("doc_id", "t"), "left")
      .na.fill(0, Seq("tf"))
    val ql = grid.join(dl, "doc_id")
      .crossJoin(broadcast(ctot))
      .withColumn("term",
        log(($"tf" + lit(2000) * $"cf" / $"c") / ($"dl" + 2000)))
      .groupBy($"doc_id")
      .agg(round(sum($"term"), 6).as("ql"))
    val ra = graft.operators.TwoPhase.rowNumber(
      bm, floor(-$"bm25" * 8), Seq($"bm25".desc, $"doc_id"), out = "r")
    val rb = graft.operators.TwoPhase.rowNumber(
      ql, floor(-$"ql" * 8), Seq($"ql".desc, $"doc_id"), out = "r")
    ra.as("ra").join(rb.as("rb"), "doc_id")
      .select($"doc_id",
        $"ra.r".cast("long").as("rank_bm25"),
        $"rb.r".cast("long").as("rank_ql"),
        round(lit(1.0) / ($"ra.r" + 60) + lit(1.0) / ($"rb.r" + 60), 6).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(10)
  }

  /** MAXIMAL MARGINAL RELEVANCE diversification (Carbonell & Goldstein
    * 1998): re-rank the top-20 BM25 candidates so the final 5 balance
    * relevance against redundancy — pick argmax of
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ = 0.7, sim = token
    * Jaccard. The greedy loop runs on the DRIVER over the collected
    * candidate scores and the candidate×candidate similarity matrix —
    * both CANDIDATE-set-sized (20 rows / ≤400 cells, the E3 scalar
    * pattern), never corpus-sized; all corpus-scale work (scoring, the
    * pairwise-similarity join) is distributed and token-keyed. Scores are
    * rounded before the greedy so selection is float-jitter-proof; ties
    * break by doc_id. Not SQL-expressible (iterative argmax over a
    * shrinking set) → SearchSpec gates the λ=1 ≡ plain top-5 law,
    * size/distinctness, and determinism. */
  /** STRICT since r6 (formerly rows-only): the greedy argmax chain is
    * UNROLLED five steps deep in the DuckDB oracle — each step re-ranks
    * the remaining candidates by round(0.7·bm25 − (1−0.7)·maxSim, 4)
    * against the selected-so-far set and takes the (mmr DESC, doc_id)
    * head. Both engines compute from the SAME rounded inputs (bm25 @4,
    * Jaccard @6) and the same IEEE constants (the oracle spells
    * `(1 - 0.7)` so the multiplier is bit-identical to Scala's `1 -
    * lambda`), so every intermediate double matches and the driver
    * hash-checks the entire greedy trajectory, not just row counts. */
  val q290MmrDiversify: GraftQuery = GraftQuery.oracled(
    "q290_mmr_diversify",
    """WITH tok0 AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
      |    FROM documents)
      |  WHERE t <> ''),
      |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok0 GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM tok0
      |       WHERE t IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      |idf AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok0
      |        WHERE t IN ('spark', 'window', 'merge') GROUP BY 1),
      |bm AS (SELECT tf.doc_id,
      |              round(sum(ln(1 + (st.n - idf.df + 0.5) / (idf.df + 0.5))
      |                        * tf.tf * 2.2
      |                        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4) AS bm25
      |       FROM tf JOIN idf ON tf.t = idf.t JOIN dl ON tf.doc_id = dl.doc_id, st
      |       GROUP BY tf.doc_id),
      |cand AS MATERIALIZED (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
      |ct AS MATERIALIZED (SELECT DISTINCT k.doc_id, t.t
      |      FROM cand k JOIN tok0 t ON t.doc_id = k.doc_id),
      |sz AS (SELECT doc_id, count(*) AS n FROM ct GROUP BY 1),
      |sim0 AS (SELECT a.doc_id AS a, b.doc_id AS b,
      |                round(count(*) / CAST(sa.n + sb.n - count(*) AS DOUBLE), 6) AS sim
      |         FROM ct a JOIN ct b ON a.t = b.t AND a.doc_id < b.doc_id
      |         JOIN sz sa ON sa.doc_id = a.doc_id
      |         JOIN sz sb ON sb.doc_id = b.doc_id
      |         GROUP BY a.doc_id, b.doc_id, sa.n, sb.n),
      |sim AS MATERIALIZED (SELECT a, b, sim FROM sim0 UNION ALL SELECT b, a, sim FROM sim0),
      |s1 AS (SELECT doc_id, round(0.7 * bm25 - (1 - 0.7) * 0, 4) AS mmr
      |       FROM cand ORDER BY mmr DESC, doc_id LIMIT 1),
      |s2 AS (SELECT c.doc_id,
      |              round(0.7 * c.bm25 - (1 - 0.7) * coalesce(max(s.sim), 0), 4) AS mmr
      |       FROM cand c
      |       LEFT JOIN sim s ON s.a = c.doc_id AND s.b IN (SELECT doc_id FROM s1)
      |       WHERE c.doc_id NOT IN (SELECT doc_id FROM s1)
      |       GROUP BY c.doc_id, c.bm25 ORDER BY mmr DESC, doc_id LIMIT 1),
      |s3 AS (SELECT c.doc_id,
      |              round(0.7 * c.bm25 - (1 - 0.7) * coalesce(max(s.sim), 0), 4) AS mmr
      |       FROM cand c
      |       LEFT JOIN sim s ON s.a = c.doc_id
      |        AND s.b IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2)
      |       WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2)
      |       GROUP BY c.doc_id, c.bm25 ORDER BY mmr DESC, doc_id LIMIT 1),
      |s4 AS (SELECT c.doc_id,
      |              round(0.7 * c.bm25 - (1 - 0.7) * coalesce(max(s.sim), 0), 4) AS mmr
      |       FROM cand c
      |       LEFT JOIN sim s ON s.a = c.doc_id
      |        AND s.b IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
      |                    UNION ALL SELECT doc_id FROM s3)
      |       WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
      |                              UNION ALL SELECT doc_id FROM s3)
      |       GROUP BY c.doc_id, c.bm25 ORDER BY mmr DESC, doc_id LIMIT 1),
      |s5 AS (SELECT c.doc_id,
      |              round(0.7 * c.bm25 - (1 - 0.7) * coalesce(max(s.sim), 0), 4) AS mmr
      |       FROM cand c
      |       LEFT JOIN sim s ON s.a = c.doc_id
      |        AND s.b IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
      |                    UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4)
      |       WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
      |                              UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4)
      |       GROUP BY c.doc_id, c.bm25 ORDER BY mmr DESC, doc_id LIMIT 1)
      |SELECT CAST(1 AS INTEGER) AS rank, doc_id, mmr FROM s1
      |UNION ALL SELECT 2, doc_id, mmr FROM s2
      |UNION ALL SELECT 3, doc_id, mmr FROM s3
      |UNION ALL SELECT 4, doc_id, mmr FROM s4
      |UNION ALL SELECT 5, doc_id, mmr FROM s5
      |ORDER BY rank""") { (spark, dir) =>
    mmrSelect(spark, dir, lambda = 0.7, k = 5)
  }

  /** q290's engine, parameterized for the spec's λ=1 law. */
  private[llm] def mmrSelect(spark: org.apache.spark.sql.SparkSession,
      dir: String, lambda: Double, k: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val cand = q159Bm25.fn(spark, dir)
      .orderBy($"bm25".desc, $"doc_id").limit(20)
    val toks = Tables.documents(spark, dir)
      .join(cand.select($"doc_id"), "doc_id")
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("t"))
      .filter($"t" =!= "").distinct()
    val sz = toks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val simDf = toks.toDF("a", "t").join(toks.toDF("b", "t"), Seq("t"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("shared"))
      .join(sz.toDF("a", "na"), Seq("a"))
      .join(sz.toDF("b", "nb"), Seq("b"))
      .select($"a", $"b",
        round($"shared" / ($"na" + $"nb" - $"shared"), 6).as("sim"))
    // candidate-set-sized collects (≤20 scores, ≤190 sims) — E3 scalars
    val scores = cand.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sims = simDf.collect()
      .flatMap { r =>
        val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> s, (b, a) -> s)
      }.toMap.withDefaultValue(0.0)
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val remaining = scala.collection.mutable.SortedSet[Long]() ++ scores.keys
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.map { d =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => sims((d, s._1))).max
        val mmr = BigDecimal(lambda * scores(d) - (1 - lambda) * maxSim)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (d, mmr)
      }.minBy { case (d, m) => (-m, d) }
      selected += best
      remaining -= best._1
    }
    spark.createDataFrame(
      selected.toSeq.zipWithIndex.map { case ((d, m), i) => (i + 1, d, m) })
      .toDF("rank", "doc_id", "mmr")
  }

  /** KWIC CONCORDANCE (key-word-in-context) — the corpus-inspection view
    * every curation analyst asks for after a term census: for the corpus's
    * dominant content token (most frequent ≥6-char token, lexicographic
    * tie-break — data-derived, not hardcoded), every document that
    * contains it with its occurrence count and the ±3-token context
    * window around the FIRST occurrence. Turns "this token is hot" into
    * "this is how it is actually used".
    *
    * 100 TB plan: term selection is one vocabulary agg; the occurrence
    * stream is filtered to ONE term map-side (broadcast join against a
    * 1-row frame) before anything shuffles, and the context slice joins
    * the tiny hit census BACK to the doc token arrays on doc_id — the
    * corpus is scanned twice but never re-shuffled, and no exploded row
    * ever carries the full token array. */
  val q308KwicConcordance: GraftQuery = GraftQuery.oracled(
    "q308_kwic_concordance",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |occ AS (SELECT doc_id, i AS pos, t[i] AS tok
      |        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)),
      |cen AS (SELECT tok FROM occ WHERE len(tok) >= 6
      |        GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 1),
      |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ,
      |                CAST(min(pos) AS BIGINT) AS first_pos
      |         FROM occ JOIN cen USING (tok) GROUP BY doc_id)
      |SELECT h.doc_id, (SELECT tok FROM cen) AS term, h.n_occ, h.first_pos,
      |       coalesce(array_to_string(t[CAST(greatest(h.first_pos - 3, 1) AS INTEGER):CAST(h.first_pos - 1 AS INTEGER)], ' '), '') AS left_ctx,
      |       coalesce(array_to_string(t[CAST(h.first_pos + 1 AS INTEGER):CAST(h.first_pos + 3 AS INTEGER)], ' '), '') AS right_ctx
      |FROM hits h JOIN toks USING (doc_id)
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
    val occ = toks.select($"doc_id", posexplode($"t"))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("tok"))
    val cen = occ.filter(length($"tok") >= 6)
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(1).select($"tok")
    val hits = occ.join(broadcast(cen), Seq("tok"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_occ"),
        min($"pos").cast("long").as("first_pos"))
    hits.join(toks, Seq("doc_id"))
      .crossJoin(broadcast(cen.select($"tok".as("term"))))
      .select($"doc_id", $"term", $"n_occ", $"first_pos",
        concat_ws(" ", slice($"t",
          greatest($"first_pos" - 3, lit(1L)).cast("int"),
          ($"first_pos" - greatest($"first_pos" - 3, lit(1L))).cast("int"))).as("left_ctx"),
        concat_ws(" ", slice($"t", ($"first_pos" + 1).cast("int"), lit(3))).as("right_ctx"))
      .orderBy($"doc_id")
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    * keyword miner: candidate phrases are the maximal stopword-free token
    * runs (the gaps-and-islands trick on token positions), each word
    * scores degree/frequency (degree = Σ lengths of phrases containing
    * it — words that travel in long phrases are "connected"), and a
    * phrase scores the sum of its words. Scores are kept integer
    * (score_ppm = Σ (10⁶·deg) div freq — the q211 exactness discipline)
    * so the ranking is bit-identical cross-engine and the whole operator
    * is DuckDB-oracle-able.
    *
    * 100 TB plan: one scan → posexplode → island window per doc (doc-keyed
    * partitions) → two vocab-sized hash-aggs (word stats, phrase stats) →
    * a broadcast word-stats join onto DISTINCT phrases. Nothing beyond
    * doc- and vocab-keyed shuffles; TakeOrdered top-20. */
  val q447RakeKeyphrases: GraftQuery = GraftQuery.oracled(
    "q447_rake_keyphrases",
    """WITH toks AS (
      |  SELECT doc_id, i AS pos, l[i] AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |       UNNEST(generate_series(1, len(l))) AS g(i)),
      |ns AS (SELECT doc_id, pos, tok,
      |              pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      |       FROM toks WHERE tok NOT IN ('a', 'the')),
      |ph AS (SELECT doc_id, isl,
      |              string_agg(tok, ' ' ORDER BY pos) AS phrase,
      |              CAST(count(*) AS BIGINT) AS plen
      |       FROM ns GROUP BY 1, 2),
      |wo AS (SELECT plen, unnest(string_split(phrase, ' ')) AS w FROM ph),
      |ws AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
      |              CAST(sum(plen) AS BIGINT) AS deg
      |       FROM wo GROUP BY 1),
      |pd AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ FROM ph GROUP BY 1),
      |pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
      |       FROM (SELECT DISTINCT phrase FROM ph)),
      |sc AS (SELECT phrase, CAST(sum((1000000 * deg) // freq) AS BIGINT) AS score_ppm
      |       FROM pw JOIN ws USING (w) GROUP BY 1)
      |SELECT pd.phrase, pd.n_occ, sc.score_ppm
      |FROM pd JOIN sc USING (phrase)
      |ORDER BY score_ppm DESC, phrase
      |LIMIT 20""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("tok"))
    val ns = toks.filter(!$"tok".isin("a", "the"))
      .withColumn("isl",
        $"pos" - row_number().over(Window.partitionBy($"doc_id").orderBy($"pos")))
    val ph = ns.groupBy($"doc_id", $"isl")
      .agg(concat_ws(" ", transform(array_sort(collect_list(struct($"pos", $"tok"))),
        x => x.getField("tok"))).as("phrase"),
        count(lit(1)).cast("long").as("plen"))
    val ws = ph.select($"plen", explode(split($"phrase", " ")).as("w"))
      .groupBy($"w")
      .agg(count(lit(1)).cast("long").as("freq"), sum($"plen").cast("long").as("deg"))
    val pd = ph.groupBy($"phrase").agg(count(lit(1)).cast("long").as("n_occ"))
    val sc = ph.select($"phrase").distinct()
      .select($"phrase", explode(split($"phrase", " ")).as("w"))
      .join(broadcast(ws), Seq("w"))
      .groupBy($"phrase")
      .agg(sum(expr("(1000000 * deg) div freq")).cast("long").as("score_ppm"))
    pd.join(sc, Seq("phrase"))
      .select($"phrase", $"n_occ", $"score_ppm")
      .orderBy($"score_ppm".desc, $"phrase")
      .limit(20)
  }

  /** AVERAGE PRECISION + PRECISION@K — the ranking-quality metrics every
    * retrieval / reranking eval reports (complementing q322's exact AUC and
    * q420's recall/NDCG family): rank the corpus by a deterministic score
    * (n_chars, unique tie-break doc_id), label = (lang = 'en'), and emit
    * P@{5,10,20,50} plus AP = mean over positives of precision-at-their-rank.
    * EVERYTHING is integer-exact: precisions in ppm, AP accumulated as
    * Σ⌊10¹²·hits/rank⌋ then ⌊·/n_pos⌋ — no double summation order anywhere,
    * so the oracle matches bit for bit.
    *
    * 100 TB plan: the global ranking and the cumulative hit count both ride
    * [[graft.operators.TwoPhase]] (bucket = score, keyed windows + a
    * bins-sized broadcast prefix — no single-task funnel); AP is one
    * map-side-combinable agg over the ranked stream; the P@k grid joins a
    * ≤50-row filtered head against a 4-row literal. */
  val q487AveragePrecision: GraftQuery = GraftQuery.oracled(
    "q487_average_precision",
    """WITH r AS (SELECT doc_id, (lang = 'en') AS pos,
      |                  row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
      |           FROM documents),
      |c AS (SELECT rk, pos,
      |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) OVER (ORDER BY rk) AS BIGINT) AS hits
      |      FROM r),
      |ap AS (SELECT CAST(sum(CASE WHEN pos THEN (1000000000000 * hits) // rk ELSE 0 END) AS BIGINT) AS s,
      |              CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
      |       FROM c),
      |pk AS (SELECT k, CAST((1000000 * max(CASE WHEN rk <= k THEN hits ELSE 0 END)) // k AS BIGINT) AS p_at_k
      |       FROM c, (SELECT unnest([5, 10, 20, 50]) AS k) g GROUP BY k)
      |SELECT CAST(k AS BIGINT) AS k, p_at_k, np AS n_positive, s // np AS ap_scaled_e12
      |FROM pk, ap ORDER BY k""") { (spark, dir) =>
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", ($"lang" === "en").as("pos"), $"n_chars")
    val ranked0 = graft.operators.TwoPhase.rowNumber(
      base, bucket = -$"n_chars", sort = Seq($"n_chars".desc, $"doc_id"), out = "rk")
    val ranked = graft.operators.TwoPhase.runningSum(
      ranked0, bucket = expr("rk div 512"), sort = Seq($"rk"),
      value = when($"pos", 1L).otherwise(0L), out = "hits")
      .select($"rk", $"pos", $"hits".cast("long").as("hits"))
    val ap = ranked.agg(
      sum(when($"pos", expr("(1000000000000 * hits) div rk"))).cast("long").as("s"),
      sum(when($"pos", 1L).otherwise(0L)).cast("long").as("np"))
    val grid = Seq(5L, 10L, 20L, 50L).toDF("k")
    val pk = ranked.filter($"rk" <= 50)
      .crossJoin(broadcast(grid)).filter($"rk" <= $"k")
      .groupBy($"k").agg(max($"hits").as("mx"))
      .select($"k", expr("(1000000 * mx) div k").as("p_at_k"))
    pk.crossJoin(broadcast(ap))
      .select($"k", $"p_at_k", $"np".as("n_positive"),
        expr("s div np").as("ap_scaled_e12"))
      .orderBy($"k")
  }

  def all: Seq[GraftQuery] = Seq(q159Bm25, q166BooleanRetrieval, q278RrfFusion,
    q290MmrDiversify, q308KwicConcordance, q447RakeKeyphrases,
    q487AveragePrecision)
}
