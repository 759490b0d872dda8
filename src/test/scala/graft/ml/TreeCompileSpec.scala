package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** q338's gate: the SQL-compiled decision tree must reproduce MLlib's own
  * `model.transform` prediction EXACTLY on every row — model-to-SQL
  * compilation is only useful if it is bit-faithful. */
class TreeCompileSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("compiled when-chain reproduces model.transform exactly on every row") {
    import spark.implicits._
    val data = Classification.embeddingFeatures(spark, sf)
    val model = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setMaxDepth(5).setSeed(Classification.Seed).fit(data)
    val mllib = model.transform(data)
      .select($"vec_id", $"prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val compiled = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id",
        Classification.compileTree(model.rootNode,
          i => element_at($"embedding", i + 1).cast("double")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(compiled.keySet === mllib.keySet)
    val diff = compiled.filter { case (k, v) => v != mllib(k) }
    assert(diff.isEmpty, s"${diff.size} rows diverge, e.g. ${diff.take(3)}")
    // the compiled column is pure Catalyst: no UDF, no vector type
    val plan = graft.sources.Tables.embeddings(spark, sf)
      .select(Classification.compileTree(model.rootNode,
        i => element_at($"embedding", i + 1).cast("double")).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
