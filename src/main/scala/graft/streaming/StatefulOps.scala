package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a stream — the `mapGroupsWithState` extension
  * point, for running aggregates that built-in windowed aggregation can't
  * express (cross-window lifetime counters, "state so far" snapshots per
  * key emitted every micro-batch).
  *
  * Determinism at scale: the running sum is kept as exact integer micros
  * (value·1e6 rounded once per event), so emissions are bit-identical
  * regardless of how events are batched into micro-batches or partitioned —
  * the same no-float-accumulation rule as the batch aggregations
  * ([[graft.llm.EventWindows]]).
  *
  * State size: one fixed-width record per live key, no history — O(keys),
  * not O(events). For unbounded key spaces pair with a timeout; the default
  * here keeps NoTimeout because per-user lifetime counters are the use case.
  */
object StatefulOps {

  /** Per-key lifetime snapshot: event count + exact value sum. */
  final case class KeyedSnapshot(key: Long, nEvents: Long, sumValue: Double)

  /** State record (public: the state encoder's codegen constructs it). */
  final case class AggState(n: Long, sumMicros: Long)

  /** The single state transition shared by [[runningTotals]] and
    * [[StatefulIngest.ingestBatch]] — one event folds into the lifetime
    * record as exact integer micros (⌊v·10⁶ + 0.5⌋, rounded ONCE per
    * event; the DuckDB replay is `floor(value*1000000 + 0.5)`, the same
    * IEEE ops). Long addition commutes, so the fold is batching- and
    * partitioning-independent.
    */
  private[streaming] def step(s: AggState, v: Double): AggState =
    AggState(s.n + 1, s.sumMicros + math.round(v * 1e6))

  /** Running (count, sum) per key, one snapshot row per key per micro-batch
    * that touched it. `update` output mode.
    *
    * @param events stream with `keyCol` (long) and `valueCol` (double)
    */
  def runningTotals(events: DataFrame, keyCol: String = "user_id",
                    valueCol: String = "value"): Dataset[KeyedSnapshot] = {
    val sess = events.sparkSession
    import sess.implicits._
    val typed = events.select(col(keyCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[AggState, KeyedSnapshot](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[AggState]) =>
          var s = state.getOption.getOrElse(AggState(0L, 0L))
          rows.foreach { case (_, v) => s = step(s, v) }
          state.update(s)
          KeyedSnapshot(key, s.n, s.sumMicros / 1e6)
      }
  }

  /** The output mode [[runningTotals]] requires. */
  val RunningTotalsOutputMode: OutputMode = OutputMode.Update()
}
