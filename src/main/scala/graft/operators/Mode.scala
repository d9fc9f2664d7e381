package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group mode — the most frequent value, with its count and
  * the group's distinct-value count: the imputation default, the
  * "dominant category" profile column, and the exact answer the
  * Misra-Gries sketch ([[graft.functions.FreqSketch]]) approximates
  * when the value domain is too wide to count exactly. Ties elect the
  * SMALLEST value (a total, engine-replayable rule — "whichever came
  * first" is not).
  *
  * Scale shape: one partial-agg'd (group, value) count — a whale value
  * collapses map-side — then ONE more partial-agg'd
  * `max(struct(count, −value…))` election per group; nothing buffers a
  * value list. Value must be integral (the negation tiebreak);
  * NULL values carry no vote (a missing value is not a mode candidate —
  * count them with [[Completeness]]); NULL groups are a real stratum.
  */
object Mode {

  /** (group, mode_value, mode_count, n_distinct). */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "perGroup")
    df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("group"), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("group"))
      .agg(
        // negate on DECIMAL: −Long.MinValue overflows ANSI long
        max(struct(col("__c").as("c"),
          (-col("__v").cast("decimal(38,0)")).as("nv"))).as("__best"),
        count(lit(1)).as("n_distinct"))
      .select(col("group"),
        (-col("__best.nv")).cast("long").as("mode_value"),
        col("__best.c").as("mode_count"), col("n_distinct"))
  }

  /** DuckDB replay of [[perGroup]]. */
  def oracleSql(table: String, groupSql: String, valueSql: String): String =
    s"""WITH c AS (
  SELECT $groupSql AS g, CAST($valueSql AS BIGINT) AS v,
    CAST(count(*) AS BIGINT) AS n
  FROM $table WHERE ($valueSql) IS NOT NULL GROUP BY 1, 2),
r AS (SELECT g, v, n,
    row_number() OVER (PARTITION BY g ORDER BY n DESC, v ASC) AS rk,
    count(*) OVER (PARTITION BY g) AS nd
  FROM c)
SELECT g AS "group", v AS mode_value, n AS mode_count,
  CAST(nd AS BIGINT) AS n_distinct
FROM r WHERE rk = 1 ORDER BY g""".stripMargin
}
