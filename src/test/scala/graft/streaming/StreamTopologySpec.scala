package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Stateful-topology contract for every streaming replay (round-8 verdict
  * item 3 — the streaming counterpart of PlanAuditSpec): a memory-sink row
  * compare proves the VALUES, but not that the intended stateful operator
  * ran (a transformWithState replay that silently planned as something else
  * could still emit the right rows on a one-batch replay). After each replay
  * drains, [[StreamTopology]] captures the public
  * `StreamingQueryProgress.stateOperators` topology; this spec pins, per
  * catalog entry, the exact operator list — and that every state store is
  * KEYED across exactly the input-derived state partition count
  * ([[StreamingQueries.streamStatePartitions]]), i.e. the scale-adaptive
  * sizing is honored end-to-end.
  *
  * The classification is exhaustive by construction: a new entry in
  * `StreamingQueries.all` fails the census test until it is classified
  * here — the same no-silent-additions discipline as PlanAuditSpec. */
class StreamTopologySpec extends AnyFunSuite with SparkFixture {

  /** catalog entry name → (registry key, expected operatorName sequence as
    * reported by StateOperatorProgress, in plan order; empty = stateless by
    * design). Registry keys are the logical names passed to runToMemory /
    * recorded at the entry's own start() site. */
  private val expected: Map[String, (String, Seq[String])] = Map(
    "q61_stream_tumbling" -> (("q61", Seq("stateStoreSave"))),
    "q62_stream_sliding" -> (("q62", Seq("stateStoreSave"))),
    "q63_stream_session_window" -> (("q63", Seq("sessionWindowStateStoreSaveExec"))),
    "q64_stream_dedup" -> (("q64", Seq("dedupe"))),
    "q65_stream_static_join" -> (("q65", Seq("stateStoreSave"))),
    "q66_stateful_sessions" -> (("q66", Seq("flatMapGroupsWithState"))),
    "q77_stream_stream_join" -> (("q77", Seq("symmetricHashJoin"))),
    "q107_stream_dedup_within_wm" -> (("q107", Seq("dedupeWithinWatermark"))),
    "q113_stream_transform_with_state" -> (("q113", Seq("transformWithStateExec"))),
    "q124_stream_file_sink" -> (("q124", Seq("stateStoreSave"))),
    "q130_foreach_batch_upsert" -> (("upsert", Seq("stateStoreSave"))),
    "q135_stream_stream_outer" -> (("q135", Seq("symmetricHashJoin"))),
    "q178_stream_variance" -> (("q178", Seq("transformWithStateExec"))),
    "q206_stream_session_timers" -> (("q206", Seq("transformWithStateExec"))),
    // chained two-level stateful aggregation: TWO stateStoreSave operators
    "q216_stream_chained_aggs" -> (("q216", Seq("stateStoreSave", "stateStoreSave"))),
    "q233_statestore_read" -> (("q233", Seq("stateStoreSave"))),
    "q240_stream_stream_semi" -> (("q240", Seq("symmetricHashJoin"))),
    "q243_stream_mapstate" -> (("q243", Seq("transformWithStateExec"))),
    "q285_stream_stream_full_outer" -> (("q285", Seq("symmetricHashJoin"))),
    "q345_stream_histogram" -> (("q345", Seq("transformWithStateExec"))),
    "q359_stream_space_saving" -> (("q359", Seq("transformWithStateExec"))),
    "q514_stream_token_bucket" -> (("q514", Seq("transformWithStateExec"))),
    "q392_stream_drift_psi" -> (("q392", Seq("stateStoreSave"))),
    // stateless by design: the as-of enrichment happens per micro-batch in
    // foreachBatch via the broadcast as-of operator; the stream itself
    // carries no state (idempotence comes from the batch_id compact view)
    "q400_stream_asof_enrich" -> (("q400", Seq())),
    "q449_stream_ooo_parity" -> (("q449", Seq("stateStoreSave"))))

  /** Entries whose streaming half IS another entry's replay (the fn
    * delegates verbatim), so their topology is the delegate's. */
  private val delegates: Map[String, String] = Map(
    "q368_lambda_parity" -> "q61_stream_tumbling")

  test("streaming catalog census: every replay is classified exactly once") {
    val names = StreamingQueries.all.map(_.name).toSet
    assert(names === expected.keySet ++ delegates.keySet,
      s"unclassified=${names -- expected.keySet -- delegates.keySet} " +
        s"stale=${(expected.keySet ++ delegates.keySet) -- names}")
    assert(delegates.values.forall(expected.contains))
  }

  test("every replay runs its expected stateful operators on keyed state") {
    // Since round 10 the state partition count is SCALE-ADAPTIVE (sized
    // from the stream's input bytes, opt guide §2.2/§2.4), so the census
    // pins parts against the same derivation the replay used — proving the
    // sizing is honored end-to-end, not that it equals the session's
    // relational shuffle setting.
    val wantParts = StreamingQueries.streamStatePartitions(spark, sf).toLong
    val failures = StreamingQueries.all
      .filter(q => expected.contains(q.name))
      .flatMap { q =>
        val (key, want) = expected(q.name)
        q.fn(spark, sf).collect() // drive the replay; the registry populates
        StreamTopology.get(key) match {
          case None => Seq(s"${q.name}: no topology recorded under '$key'")
          case Some(got) =>
            val opErr =
              if (got.map(_._1) != want)
                Seq(s"${q.name}: operators ${got.map(_._1)} != expected $want")
              else Nil
            val keyErr = got.collect {
              case (op, parts) if parts != wantParts =>
                s"${q.name}/$op: state spans $parts shuffle partitions, " +
                  s"expected the input-derived $wantParts"
            }
            opErr ++ keyErr
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
