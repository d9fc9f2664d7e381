package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trimmed mean — the robust location estimate ops dashboards want
  * when [[WeightedStats]]' median is too coarse and the plain mean is
  * one bot away from useless: drop the k smallest and k largest
  * observations, average the rest. The classical formulation sorts
  * every group (a window rank); at scale that is the whole problem,
  * so here the extremes come from two BOUNDED [[graft.functions
  * .BottomK]] multiset buffers (≤k values per (group, partition) ship
  * — the TopK partial-agg posture) and the trimmed sum is
  * total − Σbottom − Σtop: one partial-agg'd pass, NO per-group sort
  * anywhere, identical on any partitioning.
  *
  * Exact semantics: ties trim by VALUE multiset (which duplicate of a
  * tied value goes is unobservable in the sum — the published numbers
  * are tie-invariant); trimmed_sum is exact, the mean one sign-split
  * truncating q6 division; groups with n ≤ 2k publish NULL (a small
  * group is data, not a config error); values are integral cents
  * (|v| < 2⁶²/k for the negation trick, documented). NULL values
  * drop; NULL groups are real strata.
  */
object TrimmedMean {

  val Scale = 1000000L

  /** (groupCol, n, trimmed_n, trimmed_sum, mean_q6). */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    graft.Guards.requireIntegral(df, valueCol, "trimmedMean")
    val v = col(valueCol).cast("long")
    val agg = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), v.as("__v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__sum"),
        graft.functions.BottomK(k)(col("__v")).as("__lo"),
        graft.functions.BottomK(k)(-col("__v")).as("__hiNeg"))
    val sumArr = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0L), (acc, x) => acc + x)
    val trimmedN = col("n") - 2L * k
    val trimmedSum = col("__sum") - sumArr(col("__lo")) +
      sumArr(col("__hiNeg")) // hi values were negated: adding removes them
    val meanQ = (when(trimmedSum < 0, lit(-1L)).otherwise(lit(1L)) *
      call_function("div", abs(trimmedSum) * lit(Scale), trimmedN))
    agg.select(col(groupCol), col("n"),
      when(trimmedN > 0L, trimmedN).as("trimmed_n"),
      when(trimmedN > 0L, trimmedSum).as("trimmed_sum"),
      when(trimmedN > 0L, meanQ).as("mean_q6"))
  }

  /** DuckDB replay — the window formulation (an oracle, not the
    * plan); `rowsSql` yields (grp, v).
    */
  def oracleSql(rowsSql: String, groupName: String, k: Int): String =
    s"""WITH r AS (SELECT grp, v,
    row_number() OVER (PARTITION BY grp ORDER BY v ASC, v ASC) AS ra,
    row_number() OVER (PARTITION BY grp ORDER BY v DESC, v DESC) AS rd
  FROM ($rowsSql) WHERE v IS NOT NULL),
t AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(v) FILTER (WHERE ra > $k AND rd > $k) AS BIGINT) AS ts,
    CAST(count(*) FILTER (WHERE ra > $k AND rd > $k) AS BIGINT) AS tn
  FROM r GROUP BY grp)
SELECT grp AS $groupName, n,
  CASE WHEN n > ${2 * k} THEN tn END AS trimmed_n,
  CASE WHEN n > ${2 * k} THEN ts END AS trimmed_sum,
  CASE WHEN n > ${2 * k} THEN CAST(
    CASE WHEN ts < 0 THEN -((-ts) * $Scale // tn)
         ELSE ts * $Scale // tn END AS BIGINT) END AS mean_q6
FROM t ORDER BY grp"""
}
