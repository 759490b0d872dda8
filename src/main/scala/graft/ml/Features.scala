package graft.ml

import org.apache.spark.ml.feature.{Bucketizer, Imputer, MinMaxScaler, OneHotEncoder, StringIndexer, VectorAssembler}
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

  /** StringIndexer(frequencyDesc) + OneHotEncoder(dropLast=true) over
    * `c_mktsegment` — the §2.9 Encode row's missing stage. The encoding is
    * deterministic, so it oracles: StringIndexer's index is
    * `row_number() OVER (ORDER BY count DESC, value ASC) - 1` (frequency
    * order, alphabetical tie-break per the spark.ml contract) and each
    * one-hot slot is an equality indicator; the last category is dropped.
    * Scale: the fit is one tiny hash-agg over the distinct values; the
    * transform is a map-side broadcast lookup — no extra shuffle. */
  val q95OneHotEncode: GraftQuery = GraftQuery.oracled(
    "q95_onehot_encode",
    """WITH idx AS (
      |  SELECT c_mktsegment,
      |         row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1 AS seg_idx
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_custkey,
      |       CAST(i.seg_idx AS DOUBLE) AS seg_idx,
      |       CASE WHEN i.seg_idx = 0 THEN 1.0 ELSE 0.0 END AS seg_0,
      |       CASE WHEN i.seg_idx = 1 THEN 1.0 ELSE 0.0 END AS seg_1,
      |       CASE WHEN i.seg_idx = 2 THEN 1.0 ELSE 0.0 END AS seg_2,
      |       CASE WHEN i.seg_idx = 3 THEN 1.0 ELSE 0.0 END AS seg_3
      |FROM customer c JOIN idx i ON c.c_mktsegment = i.c_mktsegment
      |ORDER BY c.c_custkey""") { (spark, dir) =>
    import spark.implicits._
    val df = Tables.customer(spark, dir)
    val indexer = new StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("seg_idx")
      .setStringOrderType("frequencyDesc")
    val encoder = new OneHotEncoder()
      .setInputCol("seg_idx").setOutputCol("seg_vec") // dropLast = true (default)
    val indexed = indexer.fit(df).transform(df)
    val slots = (0 until 4).map(i =>
      element_at(vector_to_array($"seg_vec"), i + 1).as(s"seg_$i"))
    encoder.fit(indexed).transform(indexed)
      .select(($"c_custkey" +: $"seg_idx" +: slots): _*)
      .orderBy($"c_custkey")
  }

  def all: Seq[GraftQuery] = Seq(q71BucketizeScale, q72ImputeMean, q95OneHotEncode)
}
