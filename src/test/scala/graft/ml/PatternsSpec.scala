package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Gates for the pattern miners: FP-Growth's lattice and PrefixSpan's
  * sequence counts are cross-checked against exact relational aggregation
  * for the pattern sizes SQL can enumerate (1 and 2) — if the miner and
  * plain counting disagree on those, the deeper lattice is wrong too. */
class PatternsSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._

  test("FP-Growth itemsets: exact supports for sizes 1-2, floor respected") {
    import spark.implicits._
    val baskets = Patterns.basketsForSpec(spark, sf).cache()
    try {
      val nBaskets = baskets.count()
      val found = Patterns.q179FpGrowth.fn(spark, sf)
        .collect()
        .map { r =>
          val items = r.getString(0).stripPrefix("[").stripSuffix("]")
            .split(",").filter(_.nonEmpty).map(_.trim.toLong).toList
          (items, r.getLong(1))
        }
        .toMap
      assert(found.nonEmpty, "minSupport=0.2 should surface itemsets here")
      assert(found.values.forall(_ >= math.ceil(0.2 * nBaskets).toLong),
        "every reported itemset must clear the support floor")
      // exact singleton supports
      val singles = baskets.select(explode($"items").as("i"))
        .groupBy($"i").count()
        .collect().map(r => List(r.getLong(0)) -> r.getLong(1)).toMap
      for ((items, freq) <- found if items.size == 1)
        assert(freq === singles(items), s"singleton $items")
      // exact pair supports (within-basket pairs, a < b)
      val pairs = baskets
        .select($"user_id", explode($"items").as("a"))
        .join(baskets.select($"user_id", explode($"items").as("b")), "user_id")
        .filter($"a" < $"b")
        .groupBy($"a", $"b").count()
        .collect().map(r => List(r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val foundPairs = found.filter(_._1.size == 2)
      assert(foundPairs.nonEmpty, "pairs should clear 20% support in this corpus")
      for ((items, freq) <- foundPairs)
        assert(freq === pairs(items.sorted), s"pair $items")
      // completeness at size 1: every singleton above floor is reported
      for ((items, c) <- singles if c >= math.ceil(0.2 * nBaskets).toLong)
        assert(found.contains(items), s"missing frequent singleton $items")
    } finally baskets.unpersist()
  }

  test("PrefixSpan: length-1 pattern supports equal exact sequence counts") {
    import spark.implicits._
    val seqs = Patterns.sequencesForSpec(spark, sf).cache()
    try {
      val n = seqs.count()
      val found = Patterns.q182PrefixSpan.fn(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(found.nonEmpty)
      assert(found.values.forall(_ >= math.ceil(0.3 * n).toLong))
      // exact: a length-1 pattern [[t]] is supported by any sequence
      // containing t at least once
      val exact = seqs
        .select(explode(flatten($"sequence")).as("t"), $"user_id")
        .distinct()
        .groupBy($"t").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((t, c) <- exact) {
        val key = s"""[["$t"]]"""
        if (c >= math.ceil(0.3 * n).toLong)
          assert(found.get(key).contains(c), s"pattern $key: ${found.get(key)} vs $c")
        else
          assert(!found.contains(key), s"$key below floor but reported")
      }
    } finally seqs.unpersist()
  }
}
