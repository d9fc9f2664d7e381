package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style touch attribution over an event stream: for every
  * conversion event, the FIRST and LAST touchpoint (non-conversion event)
  * in the closed lookback interval `[conv_ts − lookback, conv_ts]` of the
  * same user. The training-data angle is label construction: "which
  * exposure preceded the outcome" labels for uplift/recommendation
  * models, built deterministically so regenerated labels never drift.
  *
  * Determinism: touches are ordered by the total (ts, event_id) key, so
  * first/last are unique even under timestamp ties; both engines compare
  * the same (µs, id) integer pairs.
  *
  * Scale shape: ONE hash exchange on the user + a spill-backed per-key
  * sort (the sessionized posture); first/last are conditional min/max
  * STRUCT aggregates over a RANGE frame — running frame state, not a
  * buffered event list, so a whale user costs wall-clock only. No
  * self-join of events against events (the naive interval-join form
  * shuffles the stream twice and fans out per conversion).
  */
object Attribution {

  /** One row per conversion event: (event_id, user_id, ts, first_touch_id,
    * first_touch_type, last_touch_id, last_touch_type) — NULL touch
    * columns when the lookback window holds no touchpoint.
    */
  def firstLastTouch(events: DataFrame, conversionType: String,
                     lookback: String = "2 hours",
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val lookbackMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(lookback))
    require(lookbackMicros.months == 0 && lookbackMicros.days == 0,
      s"lookback must be a sub-day interval (got '$lookback'): month/day arithmetic " +
        "is calendar-dependent and the RANGE frame works in exact microseconds")
    require(lookbackMicros.microseconds > 0,
      s"lookback must be positive, got '$lookback'")
    // micros measured in NTZ space (timestampdiff over TIMESTAMP_NTZ), not
    // unix_micros(cast to TIMESTAMP): the instant cast rebases through the
    // session timezone, which is NONLINEAR under DST — lookback membership
    // would shift by an hour around transitions and diverge from the
    // oracle's raw-timestamp comparison. Instant inputs are first made NTZ
    // under the session zone (identity under the UTC sessions Verify/Bench
    // pin).
    val micros = expr(
      s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', " +
        s"CAST($tsCol AS TIMESTAMP_NTZ))")
    val w = Window.partitionBy(col(userCol)).orderBy(micros)
      .rangeBetween(-lookbackMicros.microseconds, 0)
    val touch = when(col(typeCol) =!= conversionType,
      struct(micros.as("m"), col(idCol).cast("long").as("i"), col(typeCol).as("t")))
    events
      // NULL users: a window partition would group them TOGETHER (NULL is
      // one partition key) while the oracle's equi-join matches nothing —
      // an unattributable stream is dropped on both sides
      .where(col(userCol).isNotNull)
      .withColumn("__first", min(touch).over(w))
      .withColumn("__last", max(touch).over(w))
      .where(col(typeCol) === conversionType)
      .select(col(idCol).cast("long").as("conversion_id"), col(userCol), col(tsCol),
        col("__first.i").as("first_touch_id"), col("__first.t").as("first_touch_type"),
        col("__last.i").as("last_touch_id"), col("__last.t").as("last_touch_type"))
  }

  /** DuckDB replay — the interval-join form (the oracle can afford the
    * fan-out): touches ranked inside each conversion's window by the same
    * (ts, id) total order, rank 1 = first, rank N = last.
    */
  def oracleSql(table: String, conversionType: String, lookbackSql: String = "INTERVAL 2 HOUR",
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type", idCol: String = "event_id"): String =
    s"""WITH conv AS (SELECT $idCol AS conversion_id, $userCol, $tsCol
  FROM $table WHERE $typeCol = '$conversionType' AND $userCol IS NOT NULL),
t AS (SELECT c.conversion_id, e.$idCol AS tid, e.$typeCol AS ttype,
    row_number() OVER (PARTITION BY c.conversion_id ORDER BY e.$tsCol, e.$idCol) AS rn,
    count(*) OVER (PARTITION BY c.conversion_id) AS n
  FROM conv c JOIN $table e
    ON e.$userCol = c.$userCol AND e.$typeCol <> '$conversionType'
    AND e.$tsCol >= c.$tsCol - $lookbackSql AND e.$tsCol <= c.$tsCol)
SELECT c.conversion_id, c.$userCol, c.$tsCol,
  f.tid AS first_touch_id, f.ttype AS first_touch_type,
  l.tid AS last_touch_id, l.ttype AS last_touch_type
FROM conv c
LEFT JOIN t f ON f.conversion_id = c.conversion_id AND f.rn = 1
LEFT JOIN t l ON l.conversion_id = c.conversion_id AND l.rn = l.n
ORDER BY c.conversion_id""".stripMargin
}
