package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom WHOLE physical operator #2 (SURVEY §2.11 tier (c)): BROADCAST
  * AS-OF JOIN — probe rows pick the reference row with the greatest
  * (time, tiebreak) ≤ probe time for their key, the "latest rate/config/
  * order as of this event" lookup.
  *
  * The declarative formulation (q20: union both sides, one window pass)
  * is the right RELATIONAL plan when both sides are corpus-scale — but it
  * pays a full shuffle+sort of probe ∪ reference even when the reference
  * is a small dimension (rates tables, config history, SCD-2 dims: the
  * overwhelmingly common case). This operator is the broadcast-hash-join
  * of as-of: the reference is collected once, grouped per key and sorted
  * by (time, tiebreak) on the driver, broadcast, and every probe row
  * binary-searches its key's timeline in place — ZERO shuffle, zero sort,
  * zero window state on the probe side; the probe stays a streaming scan.
  * At 100 TB × a 10⁵-row reference that is the difference between a
  * corpus-wide sort-spill stage and a map-only pass.
  *
  * Contract (mirrors broadcast-join discipline): the REFERENCE must fit
  * in driver/executor memory — the public API is the guardrail's
  * scalar-broadcast pattern, not a general join. Tie rule: among equal
  * times the greatest tiebreak wins (identical to q20's window order
  * `t, tag, o_orderkey` picking the last non-null), so output is
  * deterministic whenever (time, tiebreak) is unique per key.
  *
  * Both time expressions must evaluate to a LONG-backed type (timestamp
  * micros / long) — cast dates upstream; this keeps the binary search on
  * primitive longs. */
final case class AsofBroadcastJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  // right side is optional per probe row → its attributes become nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofBroadcastJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsofBroadcastJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // no requiredChildDistribution/Ordering: the probe side must stay a
  // map-only scan — that IS the operator's contract.

  /** Hard cap on collected reference rows — the broadcast-join discipline
    * made loud: past this the reference is not a "small dimension" and the
    * caller should use q20's declarative window formulation instead. */
  private val MaxBuildRows = 10000000

  /** Build side collected/indexed/broadcast ONCE PER EXEC INSTANCE and
    * reused across actions (round-6 verdict #5): QueryExecution caches the
    * executed plan, so two actions on the same DataFrame share this node —
    * previously each `doExecute()` re-collected the reference. A plain
    * `BroadcastExchangeExec` route (IdentityBroadcastMode) would instead
    * rebuild the per-key sorted index IN EVERY TASK, a strictly worse trade
    * for a ≤10M-row reference; memoizing the finished index keeps the
    * per-task cost at a map lookup. The broadcast itself provides the
    * executor-side dedup (one copy per executor, torrent-distributed). */
  @transient private lazy val buildBroadcast
      : org.apache.spark.broadcast.Broadcast[Map[UnsafeRow, (Array[Long], Array[InternalRow])]] = {
    AsofBroadcastJoinExec.buildCount.incrementAndGet()
    // ---- build side: collect, group per key, sort each timeline ----
    val rightRows = right.executeCollect()
    require(rightRows.length <= MaxBuildRows,
      s"as-of broadcast build side has ${rightRows.length} rows " +
        s"(cap $MaxBuildRows) — the reference is not a small dimension; " +
        "use the declarative window as-of (q20) for corpus-scale references")
    val keyProj = UnsafeProjection.create(Seq(rightKey), right.output)
    val timeEval = BindReferences.bindReference(rightTime, right.output)
    val tieEval = BindReferences.bindReference(rightTie, right.output)
    val grouped = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
    rightRows.foreach { row =>
      // SQL comparison semantics: a NULL-time/tie reference row can never
      // satisfy `time <= probe` deterministically — skip it instead of
      // NPE-ing inside Number.longValue (ADVICE r5).
      val tv = timeEval.eval(row)
      val xv = tieEval.eval(row)
      if (tv != null && xv != null) {
        val k = keyProj(row)
        var buf = grouped.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, InternalRow)]
          grouped.put(k.copy(), buf)
        }
        buf += ((tv.asInstanceOf[Number].longValue(),
          xv.asInstanceOf[Number].longValue(), row.copy()))
      }
    }
    import scala.jdk.CollectionConverters._
    val index: Map[UnsafeRow, (Array[Long], Array[InternalRow])] =
      grouped.asScala.map { case (k, buf) =>
        val sorted = buf.sortBy(e => (e._1, e._2))
        (k, (sorted.map(_._1).toArray, sorted.map(_._3).toArray))
      }.toMap
    session.sparkContext.broadcast(index)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcast = buildBroadcast
    val leftRdd = left.execute()
    val leftOutput = left.output
    val rightWidth = right.output.length
    val lk = leftKey
    val lt = leftTime
    val allOutput = output
    leftRdd.mapPartitions { iter =>
      val idx = bcast.value
      val probeKeyProj = UnsafeProjection.create(Seq(lk), leftOutput)
      val probeTimeEval = BindReferences.bindReference(lt, leftOutput)
      val joined = new JoinedRow()
      val nullRight = new GenericInternalRow(rightWidth)
      val resultProj = UnsafeProjection.create(allOutput.map(_.asInstanceOf[Expression]), allOutput)
      iter.map { row =>
        // NULL probe time: no reference row can qualify (SQL semantics of
        // `ref.time <= NULL`) → null enrichment, never an NPE
        val tObj = probeTimeEval.eval(row)
        val t = if (tObj == null) Long.MinValue else tObj.asInstanceOf[Number].longValue()
        val hit = if (tObj == null) null
        else idx.get(probeKeyProj(row)) match {
          case Some((times, rows)) =>
            // greatest index with times(i) <= t (timelines sorted asc,
            // equal times asc by tie → the last qualifying row wins)
            var lo = 0; var hi = times.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0) rows(ans) else null
          case None => null
        }
        resultProj(joined(row, if (hit == null) nullRight else hit))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofBroadcastJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofBroadcastJoinExec {
  /** Instrumentation for the build-reuse contract (AsofBroadcastJoinSpec
    * asserts exactly ONE build across two actions on the same plan):
    * process-wide count of build-side collect+index constructions. */
  val buildCount = new java.util.concurrent.atomic.AtomicLong(0)
}

object AsofBroadcastJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofBroadcastJoinPlan(l, r, lk, lt, rk, rt, tie) =>
      AsofBroadcastJoinExec(lk, lt, rk, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsofBroadcastJoin {
  /** Public surface: as-of join `probe` against the SMALL `ref` — for each
    * probe row, the ref row (same key) with the greatest (time, tie) ≤ the
    * probe's time; ref columns come back null when no such row exists.
    * Column names resolve against each side's analyzed output; both time
    * columns must be long-backed (timestamp/long — cast dates first). */
  def asof(probe: DataFrame, ref: DataFrame,
      probeKey: String, probeTime: String,
      refKey: String, refTime: String, refTie: String): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofBroadcastJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofBroadcastJoinStrategy
    val l = probe.queryExecution.analyzed
    val r = ref.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, lt) = (attr(l, probeKey), attr(l, probeTime))
    val (rk, rt, tie) = (attr(r, refKey), attr(r, refTime), attr(r, refTie))
    // key types must MATCH EXACTLY: the build index is keyed on UnsafeRow
    // bytes, so an int probe key never finds a bigint reference key — that
    // would come back as silent all-null enrichment, not an error.
    require(lk.dataType == rk.dataType,
      s"as-of key type mismatch: $probeKey is ${lk.dataType.simpleString}, " +
        s"$refKey is ${rk.dataType.simpleString} — cast one side; a mismatch " +
        "makes every UnsafeRow lookup miss silently")
    // time/tie columns must be long-backed (timestamp micros / long / int —
    // eval'd via Number.longValue): anything else NPEs or truncates inside
    // the exec's binary search.
    import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
    val longBacked: Set[org.apache.spark.sql.types.DataType] =
      Set(TimestampType, LongType, IntegerType)
    for ((a, side) <- Seq(lt -> probeTime, rt -> refTime, tie -> refTie))
      require(longBacked(a.dataType),
        s"as-of time/tie column $side is ${a.dataType.simpleString}; " +
          "must be timestamp/long/int — cast dates upstream")
    val node = AsofBroadcastJoinPlan(l, r, lk, lt, rk, rt, tie)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
