package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TWO-PHASE GLOBAL-WINDOW machinery — the reusable form of q97's
  * bin + broadcast-offset trick (Windows.scala) and arrivalRunningMax's
  * bin + broadcast-prefix shape (EventAnalytics.scala), extracted so every
  * catalog query that needs a GLOBAL row_number / ntile / cumulative sum
  * over an unbounded input rides the 100 TB plan instead of a single-task
  * partition-less window.
  *
  * Contract (the q97 determinism argument): `bucket` must be a PURE,
  * DETERMINISTIC per-row expression that is NON-DECREASING along the target
  * sort order (ties in the sort order must map to one bucket — automatic
  * when the bucket is a function of the leading sort key). The input
  * DataFrame is consumed twice (rank branch + offsets branch) and Catalyst
  * recomputes the subtree per consumer, so a sampled `repartitionByRange`
  * could de-sync the branches; a pure per-row bucket function is identical
  * on every recomputation by construction. At 100 TB the bucket widths come
  * from range stats / a quantile sketch but stay plan-time constants.
  *
  * Plan shape: phase 1 ranks/sums WITHIN each bucket (all buckets in
  * parallel — one keyed window shuffle, no global funnel); phase 2 is one
  * tiny per-bucket aggregate whose exclusive prefix (the ONLY partition-less
  * window — buckets-sized by construction, and sitting over a hash-agg so
  * the PlanAudit partition-less-over-aggregate rule holds) broadcasts back
  * as offsets. */
object TwoPhase {

  /** Adds `out` = global row_number() over (ORDER BY sort: _*), computed
    * two-phase. When `totalOut` is set, also adds the global row count as a
    * column (needed by the ntile / percent_rank / cume_dist arithmetic).
    * All temp columns are dropped; every input column passes through. */
  def rowNumber(
      df: DataFrame,
      bucket: Column,
      sort: Seq[Column],
      out: String,
      totalOut: Option[String] = None): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket)
    val wLocal = Window.partitionBy(col(b)).orderBy(sort: _*)
    val local = binned.withColumn("__tp_lrn", row_number().over(wLocal).cast("long"))
    val wB = Window.orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = binned.groupBy(col(b)).agg(count(lit(1)).as("__tp_cnt"))
      .select(col(b),
        (sum(col("__tp_cnt")).over(wB) - col("__tp_cnt")).as("__tp_off"),
        sum(col("__tp_cnt")).over(wAll).as("__tp_total"))
    val joined = local.join(broadcast(offsets), Seq(b))
      .withColumn(out, col("__tp_off") + col("__tp_lrn"))
    totalOut.fold(joined)(t => joined.withColumn(t, col("__tp_total")))
      .drop(b, "__tp_lrn", "__tp_off", "__tp_total")
  }

  /** Adds `out` = running SUM(value) over (ORDER BY sort ROWS UNBOUNDED
    * PRECEDING .. CURRENT ROW), two-phase: per-bucket local cumsum +
    * broadcast exclusive per-bucket prefix totals (arrivalRunningMax's
    * shape with sum instead of max). `value` must be a pure per-row
    * expression (same recomputation argument as the bucket). */
  def runningSum(
      df: DataFrame,
      bucket: Column,
      sort: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket)
    val wLocal = Window.partitionBy(col(b)).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = binned.groupBy(col(b)).agg(sum(value).as("__tp_bsum"))
      .select(col(b),
        coalesce(
          sum(col("__tp_bsum")).over(Window.orderBy(col(b))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)).as("__tp_prev"))
    binned
      .withColumn("__tp_lsum", sum(value).over(wLocal))
      .join(broadcast(offsets), Seq(b))
      .withColumn(out, col("__tp_lsum") + col("__tp_prev"))
      .drop(b, "__tp_lsum", "__tp_prev")
  }

  /** Adds `out` = running MAX(value) over (ORDER BY sort ROWS UNBOUNDED
    * PRECEDING .. 1 PRECEDING) — EXCLUSIVE of the current row, null when no
    * row precedes (the skyline / disorder-audit frame) — two-phase:
    * per-bucket local exclusive running max + broadcast exclusive
    * per-bucket maxima (arrivalRunningMax's shape, exclusive variant). */
  def runningMaxExclusive(
      df: DataFrame,
      bucket: Column,
      sort: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket)
    val wLocal = Window.partitionBy(col(b)).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = binned.groupBy(col(b)).agg(max(value).as("__tp_bmax"))
      .select(col(b),
        max(col("__tp_bmax")).over(Window.orderBy(col(b))
          .rowsBetween(Window.unboundedPreceding, -1)).as("__tp_prev"))
    binned
      .withColumn("__tp_lmax", max(value).over(wLocal))
      .join(broadcast(offsets), Seq(b))
      // if exactly one side is null, both coalesce to the non-null side;
      // if both are null (global first row) the result stays null
      .withColumn(out,
        greatest(coalesce(col("__tp_lmax"), col("__tp_prev")),
          coalesce(col("__tp_prev"), col("__tp_lmax"))))
      .drop(b, "__tp_lmax", "__tp_prev")
  }

  /** Adds `out` = lag(value, 1) over (ORDER BY sort: _*), computed
    * two-phase: the lag is local within each bucket's keyed window, and
    * each bucket's FIRST row takes the PREVIOUS bucket's last value from a
    * bucket-sized boundary frame (max_by over the sort struct, then one
    * partition-less lag OVER AN AGGREGATE — the sanctioned phase-2 shape).
    * The global first row's lag is null, exactly like lag(). Same bucket
    * contract as [[rowNumber]]. */
  def lagOne(
      df: DataFrame,
      bucket: Column,
      sort: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket).withColumn("__tp_val", value)
    val wLocal = Window.partitionBy(col(b)).orderBy(sort: _*)
    val bounds = binned.groupBy(col(b))
      .agg(max_by(col("__tp_val"), struct(sort: _*)).as("__tp_last"))
      .select(col(b),
        lag(col("__tp_last"), 1).over(Window.orderBy(col(b))).as("__tp_prev"))
    binned
      .withColumn("__tp_lrn", row_number().over(wLocal))
      .withColumn("__tp_lag", lag(col("__tp_val"), 1).over(wLocal))
      .join(broadcast(bounds), Seq(b))
      .withColumn(out,
        when(col("__tp_lrn") === 1, col("__tp_prev")).otherwise(col("__tp_lag")))
      .drop(b, "__tp_val", "__tp_lrn", "__tp_lag", "__tp_prev")
  }

  /** KEYED variant of [[rowNumber]] — row_number() over (PARTITION BY keys
    * ORDER BY sort) computed two-phase WITHIN each key (the hot-category
    * fix: a 5-value key never serializes 20% of the corpus into one window
    * task). Offsets are (keys × buckets)-sized; their exclusive prefix
    * runs per key over the aggregated table and broadcasts back. */
  def rowNumberKeyed(
      df: DataFrame,
      keys: Seq[String],
      bucket: Column,
      sort: Seq[Column],
      out: String): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket)
    val wLocal = Window.partitionBy((keys.map(col) :+ col(b)): _*).orderBy(sort: _*)
    val local = binned.withColumn("__tp_lrn", row_number().over(wLocal).cast("long"))
    val offsets = binned.groupBy((keys.map(col) :+ col(b)): _*)
      .agg(count(lit(1)).as("__tp_cnt"))
      .select((keys.map(col) :+ col(b) :+
        (coalesce(
          sum(col("__tp_cnt")).over(Window.partitionBy(keys.map(col): _*)
            .orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) ).as("__tp_off")): _*)
    local.join(broadcast(offsets), keys :+ b)
      .withColumn(out, col("__tp_off") + col("__tp_lrn"))
      .drop(b, "__tp_lrn", "__tp_off")
  }

  /** KEYED variant of [[runningSum]] — running SUM(value) over
    * (PARTITION BY keys ORDER BY sort ROWS UNBOUNDED PRECEDING .. CURRENT
    * ROW) computed two-phase WITHIN each key: the fix for the
    * hot-category class where a low-cardinality partition key (5 event
    * types at 100 TB) would otherwise serialize 20% of the corpus into
    * one window task. Local cumsums partition by (keys, bucket); the
    * offsets table is (keys × buckets)-sized, its exclusive prefix runs
    * per key (keys-sized partitions over an aggregated input — the
    * PlanAudit-safe shape), and broadcasts back. */
  def runningSumKeyed(
      df: DataFrame,
      keys: Seq[String],
      bucket: Column,
      sort: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val b = "__tp_bkt"
    val binned = df.withColumn(b, bucket)
    val wLocal = Window.partitionBy((keys.map(col) :+ col(b)): _*).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = binned.groupBy((keys.map(col) :+ col(b)): _*)
      .agg(sum(value).as("__tp_bsum"))
      .select((keys.map(col) :+ col(b) :+
        coalesce(
          sum(col("__tp_bsum")).over(Window.partitionBy(keys.map(col): _*)
            .orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)).as("__tp_prev")): _*)
    binned
      .withColumn("__tp_lsum", sum(value).over(wLocal))
      .join(broadcast(offsets), keys :+ b)
      .withColumn(out, col("__tp_lsum") + col("__tp_prev"))
      .drop(b, "__tp_lsum", "__tp_prev")
  }

  /** SQL ntile(k) recovered arithmetically from a global row number `rn`
    * (long, 1-based) and the total row count `total`: the first
    * `total % k` tiles get `total/k + 1` rows (the remainder rule).
    * Exact-integer inputs < 2^53 so the double arithmetic is exact. */
  def ntileFromRn(rn: Column, total: Column, k: Int): Column = {
    val base = floor(total / k).cast("long")
    val rem = total % k
    val cut = rem * (base + 1) // rows covered by the `rem` larger tiles
    when(rn <= cut, floor((rn - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((rn - cut - 1) / base) + 1)
      .cast("int")
  }
}
