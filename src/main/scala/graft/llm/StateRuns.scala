package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** State-run compaction — run-length encoding of an event stream:
  * consecutive same-type events per user collapse to one run row
  * (type, start, end, count). The log-compaction step for state-change
  * streams ("device was ONLINE from a to b, then OFFLINE …") and the
  * generic form of [[graft.operators.Streaks]]' gaps-and-islands (days
  * → arbitrary event sequences): storage drops from events to state
  * CHANGES, and downstream interval analytics ([[graft.operators.
  * IntervalCoverage]], [[graft.operators.Concurrency]]) read runs
  * directly.
  *
  * Mechanics: per user in strict (ts, id) order, a run BOUNDARY is any
  * event whose type differs from its predecessor's (null-safe compare —
  * a NULL type forms runs like any value); the running boundary count
  * IS the run id (gaps-and-islands), and runs aggregate with min/max/
  * count. `run_seq` numbers a user's runs 1..k in time order.
  *
  * Scale shape: one lag + one running sum over the per-user order (the
  * sessionized posture — hash exchange on user, spill-backed sort; a
  * whale user is wall-clock, never memory: the state is one lag value
  * and one counter), then a partial-agg'd groupBy on (user, run).
  * NULL users form their own stream on both engines (window parity, the
  * [[Debounce]] contract); NULL ts/id rows drop (unrankable).
  */
object StateRuns {

  /** (user_id, run_seq, event_type, start_us, end_us, n_events). */
  def collapse(events: DataFrame, userCol: String = "user_id",
               tsCol: String = "ts", typeCol: String = "event_type",
               idCol: String = "event_id"): DataFrame = {
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col(idCol))
    val run = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col(tsCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      // the first row is always a boundary — tested explicitly, because
      // a NULL first type would make NULL <=> lag-of-nothing TRUE and
      // start that user's numbering at 0
      .withColumn("__chg",
        when(row_number().over(ord) === 1, 1L)
          .when(col(typeCol) <=> lag(col(typeCol), 1).over(ord), 0L)
          .otherwise(1L))
      .withColumn("__run", sum(col("__chg")).over(run))
      .groupBy(col(userCol).as("user_id"), col("__run"))
      .agg(min(col(typeCol)).as("event_type"),
        min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("__run").as("run_seq"), col("event_type"),
        col("start_us"), col("end_us"), col("n_events"))
  }

  /** Time-in-state shares — the uptime/SLA readout on top of
    * [[collapse]]: per (user, state), total microseconds spent and the
    * share of the user's observed span in exact 1e−8 units. A run's
    * duration extends to the NEXT run's START (state persists until the
    * change — that is what a state log means); the LAST run is censored
    * at its own final event (nothing is observed beyond it), so the
    * per-user durations telescope to exactly `last_event − first_event`.
    * Users whose whole span is zero (single event, or all events on one
    * timestamp) report NULL shares (a share of nothing is undefined).
    *
    * Scale shape: [[collapse]]'s posture plus one run-cardinality lead
    * window and a partial-agg'd (user, state) rollup; the per-user
    * totals join is user-cardinality and null-safe (NULL users are a
    * real stream).
    */
  def stateShares(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val runs = collapse(events, userCol, tsCol, typeCol, idCol)
      .localCheckpoint(true)
    val w = Window.partitionBy(col("user_id")).orderBy(col("run_seq"))
    val durs = runs
      .withColumn("__dur",
        coalesce(lead(col("start_us"), 1).over(w), col("end_us")) -
          col("start_us"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("__dur")).as("state_us"))
    val totals = durs.groupBy(col("user_id").as("__u2"))
      .agg(sum(col("state_us")).as("total_us"))
    durs.join(totals, col("user_id") <=> col("__u2"))
      .select(col("user_id"), col("event_type"), col("state_us"),
        col("total_us"),
        when(col("total_us") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST((CAST(state_us AS DECIMAL(38,0)) * 100000000)" +
            " div total_us AS BIGINT)")).as("share_e8"))
  }

  /** DuckDB replay of [[stateShares]]. */
  def stateSharesOracle(table: String, userCol: String = "user_id",
                        tsCol: String = "ts", typeCol: String = "event_type",
                        idCol: String = "event_id"): String =
    s"""WITH m AS (
  SELECT $userCol AS u, $typeCol AS t, epoch_us($tsCol) AS us, $idCol AS i
  FROM $table WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL),
c AS (SELECT u, t, us, i,
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN t IS NOT DISTINCT FROM lag(t) OVER w THEN 0 ELSE 1 END AS chg
  FROM m WINDOW w AS (PARTITION BY u ORDER BY us, i)),
r AS (SELECT u, t, us,
    sum(chg) OVER (PARTITION BY u ORDER BY us, i ROWS UNBOUNDED PRECEDING) AS run
  FROM c),
runs AS (SELECT u, run, min(t) AS t, min(us) AS start_us, max(us) AS end_us
  FROM r GROUP BY u, run),
d AS (SELECT u, t,
    coalesce(lead(start_us) OVER (PARTITION BY u ORDER BY run), end_us)
      - start_us AS dur
  FROM runs),
s AS (SELECT u, t, CAST(sum(dur) AS BIGINT) AS state_us FROM d GROUP BY u, t),
tot AS (SELECT u, CAST(sum(state_us) AS BIGINT) AS total_us FROM s GROUP BY u)
SELECT s.u AS user_id, s.t AS event_type, s.state_us, tot.total_us,
  CASE WHEN tot.total_us = 0 THEN NULL ELSE
    CAST((CAST(s.state_us AS HUGEINT) * 100000000)
      // CAST(tot.total_us AS HUGEINT) AS BIGINT) END AS share_e8
FROM s JOIN tot ON s.u IS NOT DISTINCT FROM tot.u
ORDER BY user_id, event_type""".stripMargin

  /** DuckDB replay of [[collapse]] — the same gaps-and-islands. */
  def oracleSql(table: String, userCol: String = "user_id",
                tsCol: String = "ts", typeCol: String = "event_type",
                idCol: String = "event_id"): String =
    s"""WITH m AS (
  SELECT $userCol AS u, $typeCol AS t, epoch_us($tsCol) AS us, $idCol AS i
  FROM $table WHERE $tsCol IS NOT NULL AND $idCol IS NOT NULL),
c AS (SELECT u, t, us, i,
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN t IS NOT DISTINCT FROM lag(t) OVER w THEN 0 ELSE 1 END AS chg
  FROM m WINDOW w AS (PARTITION BY u ORDER BY us, i)),
r AS (SELECT u, t, us,
    sum(chg) OVER (PARTITION BY u ORDER BY us, i ROWS UNBOUNDED PRECEDING) AS run
  FROM c)
SELECT u AS user_id, CAST(run AS BIGINT) AS run_seq, min(t) AS event_type,
  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
  CAST(count(*) AS BIGINT) AS n_events
FROM r GROUP BY u, run ORDER BY user_id, run_seq""".stripMargin
}
