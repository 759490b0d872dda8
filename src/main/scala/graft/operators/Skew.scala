package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables
import RelationalCore.money

/** SURVEY.md §2.10 (100 TB design rules) — skew mitigation: salted shuffle
  * join. AQE's skew-join split handles sort-merge skew automatically; the
  * salting pattern below is the explicit engine-level tool for the cases AQE
  * can't re-plan (e.g. shuffled-hash aggregation keys, streaming state).
  *
  * Pattern: the probe (fact) side gets a deterministic pseudo-random salt in
  * [0, R); the build side is replicated R times. The join key becomes
  * (key, salt) so one hot key spreads over R reducer partitions. Results are
  * provably identical to the unsalted join — the oracle states the plain
  * join. */
object Skew {

  /** Salted equi-join: `fact ⋈ build ON factKey = buildKey` with the build
    * side replicated `replicas` times. `saltOn` must be deterministic per
    * fact row (here: xxhash64 of row identity — reproducible, uniform). */
  def saltedJoin(
      fact: DataFrame, build: DataFrame,
      factKey: Column, buildKey: Column,
      saltOn: Column, replicas: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltOn), lit(replicas)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until replicas).map(lit): _*)))
    // hint forces a shuffle join so the salt actually spreads reducers
    // (a broadcast join would make salting a no-op — correct but pointless)
    salted.join(replicated.hint("shuffle_hash"),
      factKey === buildKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Revenue per order priority through a salted lineitem⋈orders join
    * (R = 8): byte-identical to the plain join the oracle states. */
  val q70SaltedJoin: GraftQuery = GraftQuery.oracled(
    "q70_salted_join",
    """SELECT o_orderpriority,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    val fact = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
    val build = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    saltedJoin(fact, build,
      factKey = $"l_orderkey", buildKey = $"o_orderkey",
      saltOn = $"l_linenumber" * 1000000 + $"l_orderkey", replicas = 8)
      .groupBy($"o_orderpriority")
      .agg(money(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_orderpriority")
  }

  def all: Seq[GraftQuery] = Seq(q70SaltedJoin)
}
