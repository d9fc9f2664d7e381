package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLO error-budget burn rate — the SRE alerting number: an SLO of
  * num/den availability (e.g. 999/1000) grants an error BUDGET of
  * 1 − slo; the burn rate is how fast a window consumes it —
  * burn = (errors/total)/(1 − slo), burn 1 = exactly on budget, 14.4 =
  * the classical "page now" fast-burn threshold. Naive error-rate
  * alerts fire on every blip at five nines and never fire at two; burn
  * normalizes by the PROMISE, which is why multiwindow burn is the
  * standard (the Google SRE workbook construction): a short window
  * catches fast burns, a long one slow leaks.
  *
  * Entirely exact: burn_q6 = n_err·den·10⁶ div (n·(den − num)) — one
  * non-negative integer division per (key, bucket); the rolling form
  * sums counts over the trailing w buckets FIRST (integer window sums)
  * and divides once, so a sparse bucket never fabricates a spike the
  * totals don't support. Empty buckets simply don't appear — callers
  * who need gap semantics densify upstream ([[DenseSeries]] posture).
  *
  * Contracts: ok must be 0/1 (raise in-plan); slo must lie in (0, 1);
  * NULL bucket/ok rows drop; NULL keys are a real stratum. Scale:
  * one partial-agg'd (key, bucket) collapse; the rolling pass is a
  * bucket-count-sized window per key, range-bounded on the bucket
  * index so calendar gaps shorten the window honestly.
  */
object SloBurn {

  val Scale = 1000000L

  private def guardedOk(okCol: String) =
    when(!col(okCol).cast("long").isin(0L, 1L), raise_error(concat(
      lit("sloBurn: ok must be 0 or 1, got "), col(okCol).cast("string")))
      .cast("long"))
      .otherwise(col(okCol).cast("long"))

  /** Per (key, bucket): (keyCol, bucket, n, n_err, burn_q6). */
  def burnRate(df: DataFrame, keyCol: String, bucketCol: String,
               okCol: String, sloNum: Long, sloDen: Long): DataFrame = {
    require(sloNum > 0 && sloNum < sloDen,
      s"slo = $sloNum/$sloDen must lie in (0, 1)")
    graft.Guards.requireIntegral(df, bucketCol, "sloBurn")
    graft.Guards.requireIntegral(df, okCol, "sloBurn")
    df.where(col(bucketCol).isNotNull && col(okCol).isNotNull)
      .select(col(keyCol), col(bucketCol).cast("long").as("bucket"),
        guardedOk(okCol).as("__ok"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(lit(1L) - col("__ok")).as("n_err"))
      .withColumn("burn_q6", call_function("div",
        col("n_err") * sloDen * Scale, col("n") * (sloDen - sloNum)))
  }

  /** Trailing-window form: burn over the last `windowBuckets` bucket
    * indexes (range frame — calendar gaps shorten the window). One row
    * per observed (key, bucket): (keyCol, bucket, w_n, w_err, burn_q6).
    */
  def burnRolling(df: DataFrame, keyCol: String, bucketCol: String,
                  okCol: String, sloNum: Long, sloDen: Long,
                  windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1, got $windowBuckets")
    val per = burnRate(df, keyCol, bucketCol, okCol, sloNum, sloDen)
      .drop("burn_q6")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rangeBetween(-(windowBuckets - 1).toLong, 0L)
    per
      .withColumn("w_n", sum(col("n")).over(w))
      .withColumn("w_err", sum(col("n_err")).over(w))
      .select(col(keyCol), col("bucket"), col("w_n"), col("w_err"),
        call_function("div", col("w_err") * sloDen * Scale,
          col("w_n") * (sloDen - sloNum)).as("burn_q6"))
  }

  /** DuckDB replay of [[burnRate]]; `eventsSql` yields (k, bucket, ok). */
  def oracleSql(eventsSql: String, keyName: String, sloNum: Long,
                sloDen: Long): String =
    s"""SELECT k AS $keyName, CAST(bucket AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n,
  CAST(count(*) FILTER (WHERE ok = 0) AS BIGINT) AS n_err,
  CAST((count(*) FILTER (WHERE ok = 0) * $sloDen * $Scale)
    // (count(*) * ${sloDen - sloNum}) AS BIGINT) AS burn_q6
FROM ($eventsSql) WHERE bucket IS NOT NULL AND ok IS NOT NULL
GROUP BY k, bucket ORDER BY $keyName, bucket"""

  /** DuckDB replay of [[burnRolling]]. */
  def rollingOracleSql(eventsSql: String, keyName: String, sloNum: Long,
                       sloDen: Long, windowBuckets: Int): String =
    s"""WITH per AS (
  SELECT k, bucket, count(*) AS n, count(*) FILTER (WHERE ok = 0) AS e
  FROM ($eventsSql) WHERE bucket IS NOT NULL AND ok IS NOT NULL
  GROUP BY k, bucket),
w AS (
  SELECT k, bucket,
    sum(n) OVER (PARTITION BY k ORDER BY bucket
      RANGE BETWEEN ${windowBuckets - 1} PRECEDING AND CURRENT ROW) AS wn,
    sum(e) OVER (PARTITION BY k ORDER BY bucket
      RANGE BETWEEN ${windowBuckets - 1} PRECEDING AND CURRENT ROW) AS we
  FROM per)
SELECT k AS $keyName, CAST(bucket AS BIGINT) AS bucket,
  CAST(wn AS BIGINT) AS w_n, CAST(we AS BIGINT) AS w_err,
  CAST((we * $sloDen * $Scale) // (wn * ${sloDen - sloNum}) AS BIGINT)
    AS burn_q6
FROM w ORDER BY $keyName, bucket"""
}
