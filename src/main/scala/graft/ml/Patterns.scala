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

  /** Frequent itemsets at 20% support over per-user click baskets. No SQL
    * oracle (the itemset lattice isn't relational); PatternsSpec
    * cross-checks every size-1 and size-2 itemset count against exact SQL
    * aggregation (q172's machinery) and the support floor. The itemset is
    * emitted as `to_json` (q182's pattern) so the driver's rows-only
    * checker never sees an array-typed column. */
  val q179FpGrowth: GraftQuery = GraftQuery.rowsOnly(
    "q179_fpgrowth_itemsets",
    doc = "FP-Growth frequent itemsets, minSupport=0.2, per-user click baskets") {
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
    * length-1 patterns against exact distinct-user counts. */
  val q182PrefixSpan: GraftQuery = GraftQuery.rowsOnly(
    "q182_prefixspan_patterns",
    doc = "PrefixSpan sequential patterns, minSupport=0.3, maxLen=3") {
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

  def all: Seq[GraftQuery] = Seq(q179FpGrowth, q182PrefixSpan)
}
