package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Trailing time-window features per key — for every row, the count / sum
  * of a value over the key's rows in the closed interval
  * `[date − windowDays, date]`. The feature-engineering primitive behind
  * "30-day trailing spend per customer", recency-weighted quality signals,
  * and per-entity activity baselines for anomaly screens.
  *
  * Exactness: the frame is a RANGE frame over the integer day number, so
  * membership is pure integer comparison (no timestamp arithmetic drift),
  * and tied dates are frame PEERS in both engines — every row of an equal
  * (key, date) pair sees the identical frame, making the result
  * row-deterministic under any partitioning. The sum accumulates in
  * DECIMAL(18,2) and casts to double once, so it is bit-identical on any
  * engine / executor count (no float accumulation order).
  *
  * Scale shape (100 TB): ONE hash exchange on the key, then a per-key
  * spill-backed sort — the [[graft.llm.EventWindows.sessionized]] posture:
  * a whale key cannot OOM the task (Spark's window sort is external; frame
  * state is one sliding aggregate), the exposure is wall-clock only — one
  * task walks the whale's history. Mitigation mirrors sessions: pre-bound
  * with a [[graft.functions.FirstK]] cut, or split the key by a coarse
  * time bucket wider than the window and stitch the overlap.
  */
object RollingWindow {

  /** Per-row trailing aggregates: input columns plus `trail_n` (row count
    * in window) and `trail_sum` (decimal-exact value sum in window).
    * `dateCol` must be a DATE; the frame is inclusive of both endpoints.
    */
  def trailingByDays(df: DataFrame, keyCol: String, dateCol: String,
                     valueCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 0, s"windowDays must be non-negative, got $windowDays")
    // integer day number since epoch — exact RANGE arithmetic, no DST/tz
    val dayNum = datediff(col(dateCol), lit("1970-01-01")).cast(LongType)
    val w = Window.partitionBy(col(keyCol)).orderBy(dayNum)
      .rangeBetween(-windowDays.toLong, 0)
    df.withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum",
        sum(col(valueCol).cast(DecimalType(18, 2))).over(w).cast(DoubleType))
  }

  /** DuckDB replay of [[trailingByDays]] — same closed RANGE interval over
    * the DATE order column (INTERVAL n DAYS PRECEDING is inclusive, like
    * the integer day-number frame), same decimal-then-double sum.
    */
  def oracleSql(table: String, keyCol: String, dateCol: String,
                valueCol: String, windowDays: Int, keepCols: Seq[String]): String = {
    val cols = keepCols.mkString(", ")
    s"""SELECT $cols, CAST(count(*) OVER w AS BIGINT) AS trail_n,
  CAST(sum(CAST($valueCol AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum
FROM $table
WINDOW w AS (PARTITION BY $keyCol ORDER BY CAST($dateCol AS DATE)
  RANGE BETWEEN INTERVAL $windowDays DAYS PRECEDING AND CURRENT ROW)""".stripMargin
  }
}
