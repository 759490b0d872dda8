package graft.ml

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** Collaborative filtering (SURVEY.md §2.9 surface): ALS matrix
  * factorization over the implicit user×item interaction matrix derived
  * from click events — the standard recommender baseline (Hu, Koren &
  * Volinsky 2008 for the implicit formulation; Spark ML's blocked ALS).
  *
  * Scale shape: ALS is THE distributed factorization — users and items are
  * blocked, each iteration solves per-block least squares with only the
  * in-block ratings + factor blocks exchanged; no step ever materializes
  * the dense matrix. The interaction aggregation below is one
  * (user, item)-keyed count — the only pass over raw events. */
object Recommender {

  /** Top-3 item recommendations per user from ALS(rank=8, 10 iters,
    * seed 42) on strength = ln(1 + clicks). No SQL oracle (iterative
    * factorization); MlSpec gates reconstruction quality against the
    * global-mean baseline and pins determinism of the interaction matrix. */
  val q174AlsRecommend: GraftQuery = GraftQuery.rowsOnly(
    "q174_als_recommend",
    doc = "ALS top-3 recs per user over ln(1+clicks) strengths") {
    (spark, dir) =>
      import spark.implicits._
      val ratings = Recommender.interactions(spark, dir)
      val als = new ALS()
        .setRank(8).setMaxIter(10).setRegParam(0.01).setSeed(42L)
        .setUserCol("user").setItemCol("item").setRatingCol("strength")
        .setColdStartStrategy("drop")
      val model = als.fit(ratings)
      model.setPredictionCol("score")
      model.recommendForAllUsers(3)
        .select($"user", posexplode($"recommendations"))
        .select(
          $"user".cast("long").as("user_id"),
          ($"pos" + 1).cast("long").as("rec_rank"),
          $"col.item".cast("long").as("item"),
          round($"col.rating".cast("double"), 4).as("score"))
        .orderBy($"user_id", $"rec_rank")
  }

  /** The (user, item, strength) interaction matrix: item = props.k mod 50,
    * strength = ln(1 + clicks). Deterministic, engine-portable. */
  def interactions(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "click")
      .select($"user_id",
        (get_json_object($"props", "$.k").cast("long") % 50).as("item"))
      .groupBy($"user_id", $"item")
      .agg(count(lit(1)).as("n"))
      .select(
        $"user_id".cast("int").as("user"),
        $"item".cast("int").as("item"),
        log(lit(1) + $"n").cast("float").as("strength"))
  }

  def all: Seq[GraftQuery] = Seq(q174AlsRecommend)
}
