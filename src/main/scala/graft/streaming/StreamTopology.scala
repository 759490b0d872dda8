package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQuery

/** Stateful-topology registry for the streaming replays (round-8 verdict
  * item 3): after each replay drains, [[record]] captures the DISTINCT
  * (stateful operator name, shuffle-partition count) pairs the PUBLIC
  * `StreamingQueryProgress.stateOperators` API reported across the replay's
  * micro-batches — no internal `lastExecution` plan walking needed.
  * `StreamTopologySpec` then asserts, per catalog entry, that the expected
  * stateful operators actually ran (a memory-sink row compare cannot tell a
  * real `transformWithState` from an accidental batch fallback) and that
  * every state store is KEYED across the session's shuffle partitions, not
  * collapsed to a single-partition store — the streaming counterpart of
  * PlanAuditSpec's batch plan contract. */
object StreamTopology {
  private val ops = TrieMap.empty[String, Seq[(String, Long)]]

  /** Record the query's reported state-operator TOPOLOGY under the replay's
    * logical name ("q61", "q130", ...): the operator list of the micro-batch
    * progress that reported the most operators (every progress lists ALL
    * state operators of the executed plan, so the longest list is the
    * complete topology — and duplicates survive, which is how a chained
    * two-level aggregation shows as two stateStoreSave entries). Repeat runs
    * of the same entry keep the longest observation, so the registry is
    * stable under CatalogSpec's run-twice determinism check. */
  private[graft] def record(name: String, q: StreamingQuery): Unit = {
    val batches = q.recentProgress.toSeq
      .map(p => Option(p.stateOperators).map(_.toSeq).getOrElse(Nil)
        .map(op => (op.operatorName, op.numShufflePartitions)))
    val best = if (batches.isEmpty) Nil else batches.maxBy(_.length)
    ops.synchronized {
      if (ops.get(name).forall(_.length <= best.length)) ops.put(name, best)
    }
    ()
  }

  /** The (operatorName, numShufflePartitions) topology seen for a replay,
    * or None if it has not run in this JVM yet. */
  def get(name: String): Option[Seq[(String, Long)]] = ops.get(name)
}
