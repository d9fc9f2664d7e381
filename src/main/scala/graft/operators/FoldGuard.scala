package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-buffer size bound for the collected-fold family ([[ExpSmooth]],
  * [[Croston]], [[TokenBucket]]): a partition-only window count raises
  * the operator's over-`maxPoints` message BEFORE the downstream
  * `collect_list` buffers the group. The window's sorter spills to disk
  * (UnsafeExternalSorter), so a whale group surfaces as the NAMED
  * contract violation instead of an aggregation-buffer OOM — the r10
  * post-collect check only caught moderate overruns and stays in place
  * as the backstop for callers who opt out (`preCheck = false`, for
  * inputs already bounded upstream, e.g. a [[DenseSeries]] calendar
  * spine of known span).
  *
  * Plan shape: the window partitions by the same key the fold
  * aggregates on, so the exchange is shared — the cost is one extra
  * spillable sort, no extra shuffle. The raise rides the folded value
  * column, so column pruning can never drop it.
  */
private[graft] object FoldGuard {

  /** Rewrites `guardCol` (a long column that feeds the collected
    * struct) to raise `message` on every row of a group larger than
    * `maxPoints`.
    */
  def preBound(rows: DataFrame, groupCol: String, guardCol: String,
               maxPoints: Long, message: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    rows.withColumn("__pn", count(lit(1)).over(w))
      .withColumn(guardCol,
        when(col("__pn") > maxPoints, raise_error(message).cast("long"))
          .otherwise(col(guardCol)))
      .drop("__pn")
  }
}
