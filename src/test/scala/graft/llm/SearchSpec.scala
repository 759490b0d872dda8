package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for q290's MMR diversification (the iterative greedy that the
  * DuckDB oracle can't express): the λ=1 degeneration law (no diversity
  * penalty ⇒ MMR ≡ plain relevance top-k), output shape, and
  * determinism. */
class SearchSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("MMR with lambda=1 equals plain BM25 top-5 (degeneration law)") {
    import spark.implicits._
    val viaMmr = Search.mmrSelect(spark, sf, lambda = 1.0, k = 5)
      .orderBy($"rank").collect().map(_.getLong(1))
    val plain = Search.q159Bm25.fn(spark, sf)
      .orderBy($"bm25".desc, $"doc_id").limit(5)
      .collect().map(_.getLong(0))
    assert(viaMmr.toSeq === plain.toSeq,
      "lambda=1 MMR must reduce to relevance-only ranking")
  }

  test("MMR output: k rows, distinct docs, rank 1 = top relevance") {
    import spark.implicits._
    val sel = Search.q290MmrDiversify.fn(spark, sf).orderBy($"rank").collect()
    assert(sel.length === 5)
    assert(sel.map(_.getLong(1)).distinct.length === 5, "selected docs must be distinct")
    val top1 = Search.q159Bm25.fn(spark, sf)
      .orderBy($"bm25".desc, $"doc_id").limit(1).collect()(0).getLong(0)
    assert(sel(0).getLong(1) === top1,
      "the first MMR pick is always the most relevant document")
    assert(sel.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("MMR selection is deterministic across runs") {
    val a = Search.q290MmrDiversify.fn(spark, sf).collect().map(_.toSeq)
    val b = Search.q290MmrDiversify.fn(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
