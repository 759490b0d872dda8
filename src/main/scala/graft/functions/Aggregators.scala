package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Encoder, Encoders}
import graft.engine.GraftQuery
import graft.operators.RelationalCore.stat
import graft.sources.Tables

/** SURVEY.md §2.4/§2.11 — custom typed UDAF surface: a Welford/Chan
  * streaming-variance `Aggregator`, the canonical merge-able statistical
  * accumulator.
  *
  * Scale shape: the buffer is 24 bytes regardless of group size; partial
  * buffers combine map-side and merge associatively across partitions —
  * exactly the contract a 1000-executor `treeAggregate` needs. Verified
  * against the engine-independent `var_samp` oracle. */
object Aggregators {

  final case class VarBuf(n: Long, mean: Double, m2: Double)

  /** Welford update + Chan parallel merge for sample variance. */
  object WelfordVariance extends Aggregator[Double, VarBuf, Double] {
    override def zero: VarBuf = VarBuf(0L, 0.0, 0.0)

    override def reduce(b: VarBuf, x: Double): VarBuf = {
      val n = b.n + 1
      val delta = x - b.mean
      val mean = b.mean + delta / n
      VarBuf(n, mean, b.m2 + delta * (x - mean))
    }

    override def merge(a: VarBuf, b: VarBuf): VarBuf =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        VarBuf(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    override def finish(r: VarBuf): Double =
      if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)

    override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Custom UDAF vs built-in: Welford variance of extended price per
    * returnflag, checked against `var_samp` (both in-engine and in the
    * DuckDB oracle). */
  val q69CustomUdaf: GraftQuery = GraftQuery.oracled(
    "q69_custom_udaf_variance",
    """SELECT l_returnflag,
      |       round(var_samp(l_extendedprice), 3) AS welford_var,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""") { (spark, dir) =>
    import spark.implicits._
    val welford = udaf(WelfordVariance)
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(welford($"l_extendedprice"), 3).as("welford_var"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  final case class TopItem(price: Double, okey: Long, lnum: Int)
  final case class TopBuf(items: Seq[TopItem])

  /** Bounded top-k typed `Aggregator`: keeps the k best (price DESC,
    * okey ASC, lnum ASC) items per group in a k-element buffer.
    *
    * This is the scale alternative to `row_number() OVER (PARTITION BY g
    * ORDER BY …) <= k`: the window formulation shuffles EVERY row to its
    * group's partition and sorts the whole group; this aggregator's partial
    * buffers cap at k items per (map task, group), so the shuffle carries at
    * most k·tasks rows per group and the reduce side merges tiny sorted
    * lists. At 100 TB with k=3 that is the difference between shuffling the
    * fact table and shuffling a few KB per group. */
  final class TopKByPrice(k: Int) extends Aggregator[TopItem, TopBuf, TopBuf] {
    private val ord: Ordering[TopItem] =
      Ordering.by((t: TopItem) => (-t.price, t.okey, t.lnum.toLong))

    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, x: TopItem): TopBuf =
      TopBuf((x +: b.items).sorted(ord).take(k))
    override def merge(a: TopBuf, b: TopBuf): TopBuf =
      TopBuf((a.items ++ b.items).sorted(ord).take(k))
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Grouped top-3 lineitems per supplier by extended price, computed with
    * the bounded partial aggregator (no per-group full sort, no whole-table
    * window shuffle) — oracle'd against the exact `row_number()` window
    * formulation in DuckDB. Tie-break (price DESC, orderkey, linenumber) is
    * total, so the k-sets are identical. */
  val q158GroupedTopK: GraftQuery = GraftQuery.oracled(
    "q158_grouped_topk_agg",
    """WITH r AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |         row_number() OVER (PARTITION BY l_suppkey
      |                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM lineitem)
      |SELECT l_suppkey, rk, l_orderkey, l_linenumber, l_extendedprice
      |FROM r WHERE rk <= 3
      |ORDER BY l_suppkey, rk""") { (spark, dir) =>
    import spark.implicits._
    val topk = udaf(new TopKByPrice(3))
    Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(topk($"l_extendedprice", $"l_orderkey", $"l_linenumber").as("top"))
      .select($"l_suppkey", posexplode($"top.items"))
      .select(
        $"l_suppkey",
        ($"pos" + 1).cast("long").as("rk"),
        $"col.okey".as("l_orderkey"),
        $"col.lnum".as("l_linenumber"),
        $"col.price".as("l_extendedprice"))
      .orderBy($"l_suppkey", $"rk")
  }

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
    * Beyer et al. SIGMOD'07 unbiased estimator): keep the k smallest
    * DISTINCT hash values; with the k-th smallest at normalized position
    * U_(k), estimate D ≈ (k−1)/U_(k). Inputs arrive pre-hashed by the
    * codegen'd `xxhash64`, sign-bit-flipped so signed order == unsigned
    * hash order. The buffer is a sorted array capped at k — a set-union
    * merge is associative/commutative and the result is a DETERMINISTIC
    * function of the value set (no RNG), unlike sampling sketches.
    *
    * Exactness law (spec-gated): when a group has ≤ k distinct values the
    * sketch holds them all and returns the EXACT count. Error law: k=256
    * gives σ ≈ 1/√(k−2) ≈ 6.3%; the spec gates at 25% (≈4σ).
    *
    * Scale shape: 2 KB of state per group regardless of cardinality,
    * map-side partial merge — the same contract as HLL (q29/q133) with a
    * mergeable exact-below-k floor HLL lacks. */
  object KmvSketch extends Aggregator[Long, Seq[Long], Long] {
    val k = 256

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], h: Long): Seq[Long] = {
      val i = java.util.Arrays.binarySearch(b.toArray, h)
      if (i >= 0) b // already present
      else {
        val at = -i - 1
        if (b.size < k) (b.take(at) :+ h) ++ b.drop(at)
        else if (at < k) ((b.take(at) :+ h) ++ b.drop(at)).take(k)
        else b
      }
    }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      // sorted set-union, capped at k
      val out = new scala.collection.mutable.ArrayBuffer[Long](k)
      var (i, j) = (0, 0)
      while (out.size < k && (i < a.size || j < b.size)) {
        if (j >= b.size || (i < a.size && a(i) < b(j))) { out += a(i); i += 1 }
        else if (i >= a.size || b(j) < a(i)) { out += b(j); j += 1 }
        else { out += a(i); i += 1; j += 1 }
      }
      out.toVector
    }

    override def finish(ks: Seq[Long]): Long =
      if (ks.size < k) ks.size.toLong
      else {
        val u = (ks.last.toDouble + 9.223372036854776e18) / 1.8446744073709552e19
        math.round((k - 1) / u)
      }

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** KMV sketch census: estimated distinct customers per order priority
    * (exact-below-k floor ⇒ exact at the small SFs, estimated at scale) —
    * FULLY STRICT-ORACLE'D, the strongest print-both form: the input hash
    * is the PORTABLE md5 60-bit prefix (the repo's random-oracle trick)
    * mapped monotonically onto the sketch's signed-long hash space
    * (h60·16 with the sign bit flipped — u = h/2⁶³ normalization then
    * reads u = h60/2⁶⁰ exactly), so DuckDB replays the ENTIRE estimator —
    * k smallest distinct hashes, U_(k), round((k−1)/U_(k)) — with the
    * same IEEE double ops and hashes the identical estimate. The exact
    * distinct count rides alongside. KmvSpec still gates the exactness
    * floor and the 4σ error law. */
  val q238KmvDistinct: GraftQuery = GraftQuery.oracled(
    "q238_kmv_distinct",
    """WITH h AS (SELECT DISTINCT o_orderpriority,
      |                  CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
      |           FROM orders),
      |r AS (SELECT o_orderpriority, h60,
      |             row_number() OVER (PARTITION BY o_orderpriority ORDER BY h60) AS rk,
      |             count(*) OVER (PARTITION BY o_orderpriority) AS nd
      |      FROM h),
      |sel AS (SELECT o_orderpriority, max(nd) AS nd,
      |               max(CASE WHEN rk = 256 THEN h60 END) AS h256
      |        FROM r WHERE rk <= 256 GROUP BY 1),
      |est AS (SELECT o_orderpriority,
      |               CASE WHEN nd < 256 THEN CAST(nd AS BIGINT)
      |                    ELSE CAST(round(255.0 / ((CAST(CAST(CAST(h256 AS HUGEINT) * 16
      |                           - 9223372036854775808 AS BIGINT) AS DOUBLE)
      |                           + 9.223372036854776e18) / 1.8446744073709552e19)) AS BIGINT)
      |               END AS est_distinct
      |        FROM sel),
      |ex AS (SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      |       FROM orders GROUP BY 1)
      |SELECT est.o_orderpriority, est.est_distinct, ex.exact_distinct
      |FROM est JOIN ex USING (o_orderpriority)
      |ORDER BY o_orderpriority""") { (spark, dir) =>
    import spark.implicits._
    val kmv = udaf(KmvSketch)
    val h60 = conv(substring(md5($"o_custkey".cast("string")), 1, 15), 16, 10)
      .cast("long")
    Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_custkey",
        (shiftleft(h60, 4) bitwiseXOR lit(Long.MinValue)).as("h"))
      .groupBy($"o_orderpriority")
      .agg(kmv($"h").as("est_distinct"),
        countDistinct($"o_custkey").cast("long").as("exact_distinct"))
      .orderBy($"o_orderpriority")
  }

  /** Centroid of a merging t-digest: running (mean, weight). */
  final case class Centroid(mean: Double, w: Long)

  /** MERGING T-DIGEST (Dunning & Ertl 2019) — the mergeable quantile
    * sketch family the catalog's approx_percentile (GK-style) doesn't
    * cover: centroids are capped by the k₁ scale function so bins stay
    * FINE near the tails and coarse in the middle — rank error ~
    * δ⁻¹·q(1−q), i.e. sub-0.1% at p99 with δ=100, where a uniform-width
    * sketch wastes its budget mid-distribution. Buffer = sorted centroid
    * list ≤ 2δ; `reduce` appends + periodically compresses, `merge`
    * merge-sorts two digests and compresses — both associative-ish and
    * partition-order stable, so the same data + same partitioning yields
    * the same digest (the q238 KMV determinism class). `finish`
    * interpolates p50/p95/p99.
    *
    * 100 TB story: per-partition state is ≤ 2δ centroids (~3 KB); the
    * value stream never shuffles — only digests travel, exactly like the
    * HLL/CMS sketches (q29/q136), but for QUANTILES. */
  final class TDigest(delta: Int) extends Aggregator[Double, Seq[Centroid], Seq[Double]] {

    override def zero: Seq[Centroid] = Vector.empty

    /** k1 scale: max weight of a centroid covering quantile midpoint q. */
    private def capAt(q: Double, n: Long): Long =
      math.max(1L, math.floor(4.0 * n * q * (1.0 - q) / delta).toLong)

    /** Re-cluster a SORTED centroid run to the k1 size budget. */
    private def compress(sorted: IndexedSeq[Centroid]): Vector[Centroid] = {
      val n = sorted.iterator.map(_.w).sum
      val out = Vector.newBuilder[Centroid]
      var cur: Centroid = null
      var done = 0L // weight fully emitted before cur
      sorted.foreach { c =>
        if (cur == null) cur = c
        else {
          val qMid = (done + (cur.w + c.w) / 2.0) / n
          if (cur.w + c.w <= capAt(qMid, n)) {
            val w = cur.w + c.w
            cur = Centroid(cur.mean + (c.mean - cur.mean) * c.w / w, w)
          } else {
            out += cur; done += cur.w; cur = c
          }
        }
      }
      if (cur != null) out += cur
      out.result()
    }

    override def reduce(b: Seq[Centroid], x: Double): Seq[Centroid] = {
      val appended = b :+ Centroid(x, 1L)
      if (appended.size > 2 * delta)
        compress(appended.sortBy(c => (c.mean, c.w)).toIndexedSeq)
      else appended
    }

    override def merge(a: Seq[Centroid], b: Seq[Centroid]): Seq[Centroid] =
      compress((a ++ b).sortBy(c => (c.mean, c.w)).toIndexedSeq)

    override def finish(buf: Seq[Centroid]): Seq[Double] = {
      val cs = compress(buf.sortBy(c => (c.mean, c.w)).toIndexedSeq)
      val n = cs.iterator.map(_.w).sum
      if (n == 0) return Vector.empty
      def quantile(q: Double): Double = {
        val target = q * n
        var cum = 0.0
        var i = 0
        while (i < cs.length) {
          val mid = cum + cs(i).w / 2.0
          if (target <= mid) {
            if (i == 0) return cs(0).mean
            val prevMid = cum - cs(i - 1).w / 2.0
            val f = (target - prevMid) / (mid - prevMid)
            return cs(i - 1).mean + f * (cs(i).mean - cs(i - 1).mean)
          }
          cum += cs(i).w
          i += 1
        }
        cs.last.mean
      }
      Vector(quantile(0.5), quantile(0.95), quantile(0.99))
    }

    override def bufferEncoder: Encoder[Seq[Centroid]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Centroid]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** t-digest quantile census per event_type — p50/p95/p99 of `value`
    * from the mergeable sketch. Sketch interpolations aren't
    * SQL-reproducible, so the entry ships PRINT-BOTH (q29's pattern): the
    * row count is strict-oracle'd, and each quantile rides as its
    * RANK-ERROR CONTRACT — the estimate's tie-robust rank interval within
    * 2% + 1/n of the target (TdigestSpec's exact gate, now enforced at
    * the DRIVER) — plus the p50 ≤ p95 ≤ p99 monotone law as booleans the
    * oracle pins TRUE. TdigestSpec still gates the numeric error and
    * determinism. */
  val q448TdigestQuantiles: GraftQuery = GraftQuery.oracled(
    "q448_tdigest_quantiles",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(1 AS BOOLEAN) AS p50_rank_ok,
      |       CAST(1 AS BOOLEAN) AS p95_rank_ok,
      |       CAST(1 AS BOOLEAN) AS p99_rank_ok,
      |       CAST(1 AS BOOLEAN) AS monotone_ok
      |FROM events GROUP BY 1 ORDER BY 1""") { (spark, dir) =>
    import spark.implicits._
    val td = udaf(new TDigest(100))
    val digests = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(td($"value").as("qs"))
      .select($"event_type",
        element_at($"qs", 1).as("p50"),
        element_at($"qs", 2).as("p95"),
        element_at($"qs", 3).as("p99"))
    def rankOk(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column, q: Double) = {
      val tol = $"n" * 0.02 + 1
      (lo - tol <= $"n" * q) && ($"n" * q <= hi + tol)
    }
    Tables.events(spark, dir)
      .select($"event_type", $"value")
      .join(broadcast(digests), Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when($"value" < $"p50", 1L).otherwise(0L)).as("lo50"),
        sum(when($"value" <= $"p50", 1L).otherwise(0L)).as("hi50"),
        sum(when($"value" < $"p95", 1L).otherwise(0L)).as("lo95"),
        sum(when($"value" <= $"p95", 1L).otherwise(0L)).as("hi95"),
        sum(when($"value" < $"p99", 1L).otherwise(0L)).as("lo99"),
        sum(when($"value" <= $"p99", 1L).otherwise(0L)).as("hi99"),
        max($"p50").as("m50"), max($"p95").as("m95"), max($"p99").as("m99"))
      .select($"event_type", $"n",
        rankOk($"lo50", $"hi50", 0.5).as("p50_rank_ok"),
        rankOk($"lo95", $"hi95", 0.95).as("p95_rank_ok"),
        rankOk($"lo99", $"hi99", 0.99).as("p99_rank_ok"),
        ($"m50" <= $"m95" && $"m95" <= $"m99").as("monotone_ok"))
      .orderBy($"event_type")
  }

  /** THETA-SKETCH SET OPERATIONS (Dasgupta et al. 2016's theta framework
    * on q238's portable KMV machinery): estimate |A∪B|, |A∩B|, |A\B| for
    * two distinct-key sets from ONE k=256 sketch of the union — the
    * mergeable set-algebra readout a DataSketches user expects, beyond
    * q238's single-set cardinality. A = custkeys ordering before
    * 1998-01-01, B = on/after. The sketch is the k smallest md5-derived
    * 60-bit hashes; θ = the kᵗʰ; any subset S is estimated as
    * |{h < θ : h ∈ S}| / (θ/2⁶⁰). Because the hash, the k-selection, the
    * θ normalization, and the one double division are engine-portable,
    * the ESTIMATES are strict-oracle'd (q238's class), with the exact
    * truths alongside — no contract booleans needed. When |A∪B| < k the
    * sketch is exact and both engines take the same CASE branch.
    *
    * 100 TB plan: one scan → custkey hash-agg with conditional min/max
    * flags (map-side combined); the k-selection is `orderBy().limit(k)`
    * → TakeOrderedAndProject (per-partition 256-heaps, never a global
    * sort); everything after is 256-row arithmetic on broadcast
    * scalars. */
  val q473KmvSetOps: GraftQuery = GraftQuery.oracled(
    "q473_kmv_set_ops",
    """WITH f AS (SELECT o_custkey AS ck,
      |                  max(CASE WHEN o_orderdate <  TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS ina,
      |                  max(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS inb
      |           FROM orders GROUP BY 1),
      |h AS (SELECT CAST(('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 15)) AS BIGINT) AS h60,
      |             max(ina) AS ina, max(inb) AS inb
      |      FROM f GROUP BY 1),
      |ex AS (SELECT CAST(count(*) AS BIGINT) AS ex_u,
      |              CAST(sum(ina * inb) AS BIGINT) AS ex_i,
      |              CAST(sum(ina * (1 - inb)) AS BIGINT) AS ex_ab FROM h),
      |r AS (SELECT h60, ina, inb, row_number() OVER (ORDER BY h60) AS rk FROM h),
      |sk AS (SELECT * FROM r WHERE rk <= 256),
      |th AS (SELECT max(CASE WHEN rk = 256 THEN h60 END) AS theta FROM sk),
      |cnt AS (SELECT CAST(count(*) AS BIGINT) AS cu,
      |               CAST(sum(ina * inb) AS BIGINT) AS ci,
      |               CAST(sum(ina * (1 - inb)) AS BIGINT) AS cab
      |        FROM sk, th WHERE h60 < th.theta)
      |SELECT CASE WHEN ex.ex_u < 256 THEN ex.ex_u
      |            ELSE CAST(round(cnt.cu / (CAST(th.theta AS DOUBLE) / 1152921504606846976)) AS BIGINT)
      |       END AS est_union,
      |       ex.ex_u AS exact_union,
      |       CASE WHEN ex.ex_u < 256 THEN ex.ex_i
      |            ELSE CAST(round(cnt.ci / (CAST(th.theta AS DOUBLE) / 1152921504606846976)) AS BIGINT)
      |       END AS est_intersect,
      |       ex.ex_i AS exact_intersect,
      |       CASE WHEN ex.ex_u < 256 THEN ex.ex_ab
      |            ELSE CAST(round(cnt.cab / (CAST(th.theta AS DOUBLE) / 1152921504606846976)) AS BIGINT)
      |       END AS est_a_not_b,
      |       ex.ex_ab AS exact_a_not_b
      |FROM ex, th, cnt""") { (spark, dir) =>
    import spark.implicits._
    val pivot = lit("1998-01-01").cast("timestamp")
    val f = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("ck"))
      .agg(max(when($"o_orderdate" < pivot, 1L).otherwise(0L)).as("ina"),
        max(when($"o_orderdate" >= pivot, 1L).otherwise(0L)).as("inb"))
    val h = f
      .select(conv(substring(md5($"ck".cast("string")), 1, 15), 16, 10)
          .cast("long").as("h60"), $"ina", $"inb")
      .groupBy($"h60").agg(max($"ina").as("ina"), max($"inb").as("inb"))
    val ex = h.agg(count(lit(1)).cast("long").as("ex_u"),
      sum($"ina" * $"inb").cast("long").as("ex_i"),
      sum($"ina" * (lit(1L) - $"inb")).cast("long").as("ex_ab"))
    // The 256-row sketch is localCheckpoint'ed: θ and the membership
    // counts both read it, and without the cut each branch would
    // re-derive the corpus-scale hash-agg (the q100 iterative-op trick,
    // applied to a bounded intermediate).
    val sk = h.orderBy($"h60").limit(256).localCheckpoint()
    val th = sk.agg(count(lit(1)).as("ksz"), max($"h60").as("hmax"))
      .select(when($"ksz" === 256, $"hmax").as("theta"))
    val cnt = sk.crossJoin(broadcast(th))
      .filter($"h60" < $"theta")
      .agg(count(lit(1)).cast("long").as("cu"),
        sum($"ina" * $"inb").cast("long").as("ci"),
        sum($"ina" * (lit(1L) - $"inb")).cast("long").as("cab"))
    def est(c: Column): Column =
      round(c / ($"theta".cast("double") / 1.152921504606846976e18)).cast("long")
    ex.crossJoin(broadcast(th)).crossJoin(broadcast(cnt))
      .select(
        when($"ex_u" < 256, $"ex_u").otherwise(est($"cu")).as("est_union"),
        $"ex_u".as("exact_union"),
        when($"ex_u" < 256, $"ex_i").otherwise(est($"ci")).as("est_intersect"),
        $"ex_i".as("exact_intersect"),
        when($"ex_u" < 256, $"ex_ab").otherwise(est($"cab")).as("est_a_not_b"),
        $"ex_ab".as("exact_a_not_b"))
  }

  def all: Seq[GraftQuery] = Seq(q69CustomUdaf, q158GroupedTopK, q238KmvDistinct,
    q448TdigestQuantiles, q473KmvSetOps)
}
