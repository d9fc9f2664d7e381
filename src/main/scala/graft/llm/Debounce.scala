package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event debounce — retry-storm and double-fire suppression: collapse
  * each BURST of same-typed events on a key (SDK retries, double
  * clicks, sensor chatter, webhook re-deliveries) to its first event.
  * The telemetry-cleaning twin of exact dedup: the rows are NOT
  * identical (each retry carries a fresh id and timestamp), so no
  * fingerprint catches them — proximity in time is the duplicate
  * signal.
  *
  * Burst semantics are TRAILING-EXTEND (the gaps-and-islands rule, the
  * same rule `session_window` merges by): an event within `cooldownUs`
  * of its PREDECESSOR extends the burst, so a storm firing every second
  * under a 10-second cooldown is ONE burst however long it lasts. The
  * alternative (a fixed window from the burst leader) is a
  * non-associative greedy fold that cannot be expressed as a window
  * function — callers wanting bounded suppression should debounce, then
  * re-admit on [[burstStats]]' span. Ordering is strict (ts, id) — the
  * actionSequences rankability contract; unrankable rows (NULL ts/id)
  * drop.
  *
  * Scale shape: one per-(key, type) lag window ([[EventWindows
  * .sessionized]]'s posture — hash-partitioned, spill-backed; a whale
  * key serializes wall-clock only, and the split-and-stitch mitigation
  * applies the same way). The debounce itself needs only `lag`, not
  * burst ids: a kept event IS one whose gap clears the cooldown.
  */
object Debounce {

  private def marked(events: DataFrame, cooldownUs: Long, keyCol: String,
                     typeCol: String, tsCol: String, idCol: String) = {
    require(cooldownUs >= 1, s"cooldownUs must be positive, got $cooldownUs")
    val w = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(col("__us"), col(idCol))
    events
      .where(col(tsCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") >= cooldownUs, 1L)
          .otherwise(0L))
  }

  /** The kept rows: each burst's first event, as
    * (idCol, keyCol, typeCol, ts_us).
    */
  def debounced(events: DataFrame, cooldownUs: Long,
                keyCol: String = "user_id", typeCol: String = "event_type",
                tsCol: String = "ts", idCol: String = "event_id"): DataFrame =
    marked(events, cooldownUs, keyCol, typeCol, tsCol, idCol)
      .where(col("__new") === 1L)
      .select(col(idCol), col(keyCol), col(typeCol), col("__us").as("ts_us"))

  /** The audit twin: one row per burst — (keyCol, typeCol, first_us,
    * last_us, n_events, span_us). `n_events = 1` bursts are ordinary
    * events; the storm report is `n_events > 1`.
    */
  def burstStats(events: DataFrame, cooldownUs: Long,
                 keyCol: String = "user_id", typeCol: String = "event_type",
                 tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(col("__us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked(events, cooldownUs, keyCol, typeCol, tsCol, idCol)
      .withColumn("__bid", sum(col("__new")).over(w))
      .groupBy(col(keyCol), col(typeCol), col("__bid"))
      .agg(min(col("__us")).as("first_us"), max(col("__us")).as("last_us"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col(typeCol), col("first_us"), col("last_us"),
        col("n_events"), (col("last_us") - col("first_us")).as("span_us"))
  }

  /** DuckDB replay of [[debounced]]. */
  def debouncedOracle(table: String, cooldownUs: Long,
                      keyCol: String = "user_id", typeCol: String = "event_type",
                      tsCol: String = "ts", idCol: String = "event_id"): String =
    s"""WITH m AS (
  SELECT $idCol, $keyCol, $typeCol, epoch_us($tsCol) AS us,
    epoch_us($tsCol) - lag(epoch_us($tsCol)) OVER
      (PARTITION BY $keyCol, $typeCol ORDER BY epoch_us($tsCol), $idCol) AS gap
  FROM $table WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL)
SELECT $idCol, $keyCol, $typeCol, CAST(us AS BIGINT) AS ts_us
FROM m WHERE gap IS NULL OR gap >= $cooldownUs
ORDER BY $idCol""".stripMargin

  /** DuckDB replay of [[burstStats]]. */
  def burstStatsOracle(table: String, cooldownUs: Long,
                       keyCol: String = "user_id", typeCol: String = "event_type",
                       tsCol: String = "ts", idCol: String = "event_id"): String =
    s"""WITH m AS (
  SELECT $keyCol, $typeCol, $idCol, epoch_us($tsCol) AS us,
    CASE WHEN lag(epoch_us($tsCol)) OVER w IS NULL
        OR epoch_us($tsCol) - lag(epoch_us($tsCol)) OVER w >= $cooldownUs
      THEN 1 ELSE 0 END AS new_b
  FROM $table WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL
  WINDOW w AS (PARTITION BY $keyCol, $typeCol ORDER BY epoch_us($tsCol), $idCol)),
n AS (SELECT *, sum(new_b) OVER (PARTITION BY $keyCol, $typeCol
    ORDER BY us, $idCol ROWS UNBOUNDED PRECEDING) AS bid FROM m)
SELECT $keyCol, $typeCol, CAST(min(us) AS BIGINT) AS first_us,
  CAST(max(us) AS BIGINT) AS last_us, CAST(count(*) AS BIGINT) AS n_events,
  CAST(max(us) - min(us) AS BIGINT) AS span_us
FROM n GROUP BY $keyCol, $typeCol, bid
ORDER BY $keyCol, $typeCol, first_us""".stripMargin
}
