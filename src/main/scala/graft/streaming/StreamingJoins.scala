package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with an event-time bound — Spark's native
  * watermarked join, wrapped so the state contract is explicit.
  *
  * Semantics: pair left and right rows with equal keys whose timestamps
  * satisfy `right.ts ∈ [left.ts - before, left.ts + after]` — the streaming
  * counterpart of the batch [[graft.operators.RangeJoin]] with a
  * symmetric-window interval side.
  *
  * State: BOTH sides buffer rows until the watermark proves no counterpart
  * can still arrive; the time-range condition is what lets Spark evict —
  * an unbounded-condition stream-stream join would keep state forever.
  * Buffered volume ≈ input-rate × (lateness + window width) per side,
  * independent of stream length. The shuffle is the same hash-by-key
  * exchange as the batch join.
  */
object StreamingJoins {

  /** @param left      streaming frame with `keyCol` and event-time `tsCol`
    * @param right     streaming frame with `rightKeyCol`/`rightTsCol`
    *                  (names must differ from the left's — rename upstream)
    * @param before    how far BEFORE the left ts a right row may be
    * @param after     how far AFTER the left ts a right row may be
    * @param lateness  watermark delay applied to both sides
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   rightKeyCol: String, rightTsCol: String,
                   before: String = "30 minutes", after: String = "30 minutes",
                   lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsCol, lateness)
    val r = right.withWatermark(rightTsCol, lateness)
    l.join(r,
      col(keyCol) === col(rightKeyCol) &&
        col(rightTsCol) >= col(tsCol) - expr(s"INTERVAL $before") &&
        col(rightTsCol) <= col(tsCol) + expr(s"INTERVAL $after"))
  }
}
