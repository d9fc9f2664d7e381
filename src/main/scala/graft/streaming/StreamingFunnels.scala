package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[graft.llm.EventFunnels]]: the funnel walk is
  * PREFIX-DEPENDENT (a step consumes the earliest eligible event), so a
  * correct incremental version cannot fold events in arrival order — it
  * buffers per user and folds only the prefix the WATERMARK has sealed, in
  * event-time order. That is the canonical buffer-until-watermark pattern
  * for order-sensitive streaming state, complementing the order-INSENSITIVE
  * state demo ([[StatefulOps]] exact sums, which needs no buffer at all).
  *
  * Contract: with a watermark of delay D, events later than D are dropped
  * by Spark before they reach the state function (standard watermark
  * semantics), so the folded prefix never has to be reopened — each event
  * is folded exactly once, in ts order, and the emitted
  * `steps_completed` equals the batch walk over the sealed prefix.
  *
  * State size: the fold result is 3 fixed-width fields; the buffer holds
  * only events NEWER than the watermark (bounded by delay × per-user event
  * rate), and only funnel-step events enter it at all.
  */
object StreamingFunnels {

  final case class FunnelSnapshot(user_id: Long, steps_completed: Int,
                                  first_us: Long, n_buffered: Int)

  /** State: folded walk over the sealed prefix + the unsealed buffer.
    * (public: the state encoder's codegen constructs it) */
  final case class FunnelState(step: Int, t1: Long, tprev: Long,
                               buf: List[(Long, Int)])

  /** Per-user funnel progress over a watermarked stream; one snapshot per
    * touched user per micro-batch (`update` mode). `first_us` is −1 until
    * step 1 seals.
    */
  def funnelProgress(events: DataFrame, steps: Seq[String],
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type"): Dataset[FunnelSnapshot] = {
    val sess = events.sparkSession
    import sess.implicits._
    val k = steps.length
    val si = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    // the watermarked ts attribute must survive the projection — dropping
    // it severs event-time tracking and getCurrentWatermarkMs throws
    val typed = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long"),
        unix_micros(col(tsCol).cast("timestamp")).as("t"), si.as("si"),
        col(tsCol))
      .as[(Long, Long, Int, java.sql.Timestamp)]

    typed.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelSnapshot](GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Int, java.sql.Timestamp)], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0, -1L, -1L, Nil))
          val buf = s.buf ++ rows.map(r => (r._2, r._3))
          // the watermark seals everything STRICTLY before it; events AT the
          // watermark stay buffered — Spark's late-event filter only drops
          // rows strictly older than the watermark, so an equal-ts event can
          // still arrive in a later batch, and folding its already-seen
          // equal-ts peers now would fix a tie order the batch fold decides
          // with both rows in hand
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, pending) = buf.partition(_._1 < wmUs)
          var (step, t1, tprev) = (s.step, s.t1, s.tprev)
          ripe.sorted.foreach { case (t, stepIdx) =>
            val advance = step < k && stepIdx == step + 1 && (step == 0 || t > tprev)
            if (advance) {
              if (step == 0) t1 = t
              tprev = t
              step += 1
            }
          }
          s = FunnelState(step, t1, tprev, pending)
          state.update(s)
          // event-time timeout: wake this key when the watermark passes
          // its oldest unsealed event, so the buffered prefix folds and
          // emits WITHOUT new per-key data — otherwise a user whose last
          // events sit in the buffer would never publish their final
          // steps (the r10 fix that makes the operator driver-gateable
          // end-to-end); cascades until the buffer drains
          if (pending.nonEmpty) {
            val wakeMs = pending.map(_._1).min / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
          }
          FunnelSnapshot(user, step, t1, pending.size)
      }
  }

  /** The output mode [[funnelProgress]] requires. */
  val FunnelOutputMode: OutputMode = OutputMode.Update()
}
