package graft.ml

import org.apache.spark.ml.feature.{Bucketizer, Imputer, MinMaxScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.operators.RelationalCore.stat
import graft.sources.Tables

/** SURVEY.md §2.9 — feature-engineering stages whose math is exact and
  * closed-form, which makes them DuckDB-oracle-able unlike the model fits:
  * Bucketizer (fixed splits ≡ CASE WHEN), MinMaxScaler ((x-min)/(max-min)),
  * Imputer (mean of non-nulls). Each runs through the real `spark.ml`
  * Estimator/Transformer API — the oracle states the arithmetic identity. */
object Features {

  /** Bucketizer + VectorAssembler + MinMaxScaler over customer balances. */
  val q71BucketizeScale: GraftQuery = GraftQuery.oracled(
    "q71_bucketize_scale",
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN 0.0
      |            WHEN c_acctbal < 5000 THEN 1.0
      |            ELSE 2.0 END AS bal_bucket,
      |       round((c_acctbal - min(c_acctbal) OVER ()) /
      |                  (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 4) AS bal_scaled
      |FROM customer
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val bucketizer = new Bucketizer()
      .setInputCol("c_acctbal").setOutputCol("bal_bucket")
      .setSplits(Array(Double.NegativeInfinity, 0.0, 5000.0, Double.PositiveInfinity))
    val assembler = new VectorAssembler()
      .setInputCols(Array("c_acctbal")).setOutputCol("bal_vec")
    val scaler = new MinMaxScaler().setInputCol("bal_vec").setOutputCol("bal_scaled_vec")
    val withBucket = assembler.transform(bucketizer.transform(Tables.customer(spark, dir)))
    scaler.fit(withBucket).transform(withBucket)
      .select($"c_custkey", $"bal_bucket",
        stat(element_at(vector_to_array($"bal_scaled_vec"), 1)).as("bal_scaled"))
      .orderBy($"c_custkey")
  }

  /** Imputer(mean) over manufactured nulls (negative balances → NULL):
    * imputed value ≡ AVG of the non-null population. */
  val q72ImputeMean: GraftQuery = GraftQuery.oracled(
    "q72_impute_mean",
    """WITH d AS (SELECT c_custkey,
      |                  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      |           FROM customer)
      |SELECT c_custkey,
      |       round(coalesce(bal, (SELECT avg(bal) FROM d)), 4) AS bal_imputed
      |FROM d
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val withNulls = Tables.customer(spark, dir)
      .select($"c_custkey",
        when($"c_acctbal" < 0, lit(null).cast("double")).otherwise($"c_acctbal").as("bal"))
    val imputer = new Imputer()
      .setInputCol("bal").setOutputCol("bal_imputed").setStrategy("mean")
    imputer.fit(withNulls).transform(withNulls)
      .select($"c_custkey", stat($"bal_imputed").as("bal_imputed"))
      .orderBy($"c_custkey")
  }

  def all: Seq[GraftQuery] = Seq(q71BucketizeScale, q72ImputeMean)
}
