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

  def all: Seq[GraftQuery] = Seq(q159Bm25, q166BooleanRetrieval)
}
