package graft.operators

import org.apache.spark.ml.feature.QuantileDiscretizer
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** SURVEY.md §2.4/§2.9 — the notebook-EDA surface: `describe()` (the
  * canonical first cell of every reference-category notebook) and
  * quantile-based discretization (approx → rows-only; determinism is gated
  * by the catalog run-twice suite). */
object Eda {

  /** `describe()` over the lineitem measures — count/mean/stddev/min/max as
    * the notebook EDA table. String-typed by API contract; deterministic for
    * fixed data. */
  val q84Describe: GraftQuery = GraftQuery.rowsOnly(
    "q84_describe",
    doc = "lineitem.describe(l_quantity, l_extendedprice, l_discount)") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .describe("l_quantity", "l_extendedprice", "l_discount")
      .orderBy($"summary")
  }

  /** QuantileDiscretizer (Greenwald-Khanna approximate quantiles) into 5
    * buckets + per-bucket occupancy — buckets must be near-equal by
    * construction (asserted in EdaSpec). */
  val q85QuantileDiscretize: GraftQuery = GraftQuery.rowsOnly(
    "q85_quantile_discretize",
    doc = "QuantileDiscretizer(5 buckets, relErr=0.001) on o_totalprice; bucket occupancy") { (spark, dir) =>
    import spark.implicits._
    val disc = new QuantileDiscretizer()
      .setInputCol("o_totalprice").setOutputCol("bucket")
      .setNumBuckets(5).setRelativeError(0.001)
    disc.fit(Tables.orders(spark, dir))
      .transform(Tables.orders(spark, dir))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        RelationalCore.money(min($"o_totalprice")).as("lo"),
        RelationalCore.money(max($"o_totalprice")).as("hi"))
      .orderBy($"bucket")
  }

  def all: Seq[GraftQuery] = Seq(q84Describe, q85QuantileDiscretize)
}
