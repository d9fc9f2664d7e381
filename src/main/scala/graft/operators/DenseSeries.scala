package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar densification — turn a sparse per-(group, day) aggregate into a
  * DENSE daily series with explicit zero rows for the missing days, spanning
  * each group's own [min, max] date range. The gap between "no row" and
  * "zero" is where dashboard trend lines, moving averages, and
  * freshness/SLA alerts silently go wrong: a 3-day ingestion outage is
  * invisible in a sparse GROUP BY (the days just aren't there) and
  * unmissable in a dense one (three zero rows).
  *
  * Scale shape: the raw scan collapses to one partial-agg'd (group, day)
  * aggregate (output ≤ groups × days whatever the row count); the span
  * table is group-sized; the dense spine is `sequence(min, max)` exploded
  * per group — Σ span-days rows, the OUTPUT size, never the input — then
  * one hash join back on (group, day). Nothing scans the corpus twice and
  * no window function appears. A decade-long span is ~3.7k rows per group;
  * a group with a pathological span (one event in 1970, one today) costs
  * its own span only — cap upstream if spans are untrusted.
  *
  * Exactness: counts are longs; value sums route through DECIMAL(38,0)
  * (the ANSI overflow discipline) and emerge as BIGINT; zero-fill is
  * `coalesce` after the left join, so a day with rows but NULL values
  * still reports its true count.
  */
object DenseSeries {

  /** (groupCol, day, n_rows, sum_value) for EVERY day in each group's
    * [min day, max day] span — missing days carry (0, 0). `valueCol` must
    * be integral (the Drift rule: scale to cents/millis upstream); rows
    * with a NULL date are dropped (they have no day to land on), and rows
    * with a NULL GROUP are dropped too — the spine-to-aggregate join is
    * NULL-rejecting, so keeping them would zero-fill the null group's
    * real counts and fabricate an outage (coalesce a sentinel group
    * upstream to monitor unattributed rows).
    */
  def denseDaily(df: DataFrame, groupCol: String, dateCol: String,
                 valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "denseDaily")
    val sparse = df
      .where(col(dateCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol), col(dateCol).cast("date").as("day"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(38,0)")).cast("long").as("__sv"))
    val spine = sparse
      .groupBy(col(groupCol))
      .agg(min(col("day")).as("__mn"), max(col("day")).as("__mx"))
      .select(col(groupCol), explode(sequence(col("__mn"), col("__mx"))).as("day"))
    spine
      .join(sparse, Seq(groupCol, "day"), "left")
      .select(col(groupCol), col("day"),
        coalesce(col("__n"), lit(0L)).as("n_rows"),
        coalesce(col("__sv"), lit(0L)).as("sum_value"))
  }

  /** [[denseDailyOracle]] without the final ORDER BY — embeddable as a
    * CTE body (the [[Deltas]] oracle builds on it; string-patching the
    * ordered form would couple silently to its exact text).
    */
  def denseDailyOracleBody(table: String, groupCol: String, dateCol: String,
                           valueSql: String): String =
    s"""WITH a AS (
  SELECT $groupCol, CAST($dateCol AS DATE) AS day, count(*) AS n,
    sum(CAST($valueSql AS DECIMAL(38,0))) AS sv
  FROM $table WHERE $dateCol IS NOT NULL AND $groupCol IS NOT NULL
  GROUP BY 1, 2),
s AS (SELECT $groupCol, min(day) AS mn, max(day) AS mx FROM a GROUP BY 1),
d AS (SELECT $groupCol,
    CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
  FROM s)
SELECT d.$groupCol, d.day,
  CAST(coalesce(a.n, 0) AS BIGINT) AS n_rows,
  CAST(coalesce(a.sv, 0) AS BIGINT) AS sum_value
FROM d LEFT JOIN a ON d.$groupCol = a.$groupCol AND d.day = a.day""".stripMargin

  /** DuckDB replay of [[denseDaily]] — generate_series spine per group,
    * same zero-fill.
    */
  def denseDailyOracle(table: String, groupCol: String, dateCol: String,
                       valueSql: String): String =
    denseDailyOracleBody(table, groupCol, dateCol, valueSql) + "\nORDER BY 1, 2"
}
