package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-sided CUSUM drift monitor — Page's sequential detector as the
  * ONLINE companion of [[ChangePoint]] (that one scans a finished
  * series for where it shifted; this tracks ACCUMULATING evidence at
  * every point, the alerting readout): with target-plus-allowance k
  * and decision threshold h,
  *
  *   S⁺_t = max(0, S⁺_{t−1} + x_t − k)   (upward shift evidence)
  *   S⁻_t = max(0, S⁻_{t−1} + k − x_t)   (downward)
  *
  * alarm when either reaches h. The recurrence LOOKS sequential, but
  * max(0, ·) folds into prefix algebra — S_t = P_t − min(0, min_{j≤t}
  * P_j) with P the running sum of (x − k) — so the whole monitor is
  * two prefix-sum windows and two running mins (ROWS frames, exact
  * longs, no fold, no division, no float anywhere), unlike the
  * genuinely nonlinear [[ExpSmooth]] recurrences. Post-alarm resets
  * are deliberately NOT applied: S keeps accumulating, the alarm
  * column stays up while evidence persists, and episode boundaries are
  * a gaps-and-islands pass downstream if wanted.
  *
  * Contracts: one row per (group, idx) expected (duplicate indexes
  * order the prefix ambiguously — ties break by value for
  * determinism); NULL idx/value rows drop; NULL groups are a real
  * stratum; prefix sums ride longs and throw loudly under ANSI past
  * ±9.2·10¹⁸ (pre-scale upstream). Scale shape: the sessionized rank
  * posture — hash by group, spill-backed per-group sort, four running
  * aggregates in ONE window pass; a whale group costs one task's
  * wall-clock, never memory.
  */
object Cusum {

  /** (groupCol, idx, s_pos, s_neg, alarm_up, alarm_dn). */
  def twoSided(df: DataFrame, groupCol: String, idxCol: String,
               valueCol: String, k: Long, h: Long): DataFrame = {
    require(h > 0, s"threshold h must be > 0, got $h")
    graft.Guards.requireIntegral(df, idxCol, "twoSided")
    graft.Guards.requireIntegral(df, valueCol, "twoSided")
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast(LongType).as("idx"),
        col(valueCol).cast(LongType).as("__x"))
    val run = Window.partitionBy(col(groupCol))
      .orderBy(col("idx").asc, col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("__p", sum(col("__x") - lit(k)).over(run))
      .withColumn("__q", sum(lit(k) - col("__x")).over(run))
      .withColumn("s_pos", col("__p") - least(lit(0L), min(col("__p")).over(run)))
      .withColumn("s_neg", col("__q") - least(lit(0L), min(col("__q")).over(run)))
      .select(col(groupCol), col("idx"), col("s_pos"), col("s_neg"),
        (col("s_pos") >= h).as("alarm_up"), (col("s_neg") >= h).as("alarm_dn"))
  }

  /** DuckDB replay of [[twoSided]] — the same two prefix windows and
    * running mins, ROWS frames spelled explicitly.
    */
  def oracleSql(seriesSql: String, groupName: String, k: Long,
                h: Long): String =
    s"""WITH b AS (
  SELECT $groupName, CAST(i AS BIGINT) AS idx, CAST(x AS BIGINT) AS x
  FROM ($seriesSql) WHERE i IS NOT NULL AND x IS NOT NULL),
w1 AS (
  SELECT $groupName, idx, x,
    sum(x - $k) OVER win AS p, sum($k - x) OVER win AS q
  FROM b
  WINDOW win AS (PARTITION BY $groupName ORDER BY idx ASC, x ASC
    ROWS UNBOUNDED PRECEDING)),
w AS (
  SELECT $groupName, idx, p, q,
    min(p) OVER win AS mp, min(q) OVER win AS mq
  FROM w1
  WINDOW win AS (PARTITION BY $groupName ORDER BY idx ASC, x ASC
    ROWS UNBOUNDED PRECEDING))
SELECT $groupName, idx,
  CAST(p - least(0, mp) AS BIGINT) AS s_pos,
  CAST(q - least(0, mq) AS BIGINT) AS s_neg,
  (p - least(0, mp)) >= $h AS alarm_up,
  (q - least(0, mq)) >= $h AS alarm_dn
FROM w ORDER BY $groupName, idx"""
}
