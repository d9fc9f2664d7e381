package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lag-k autocorrelation — does a per-group integer time series echo
  * itself k steps later? The standard seasonality/persistence screen a
  * pipeline runs before trusting a forecast window ([[Backtest]] scores
  * the forecast AFTER you pick the season; this is how you FIND the
  * season — lag 7 high on daily counts means weekly rhythm) and before
  * alerting on "anomalous" values that are just autocorrelated noise.
  *
  * Pairs are matched EXACTLY on the integer index: (v at t−lag, v at t)
  * joins on `t = t' + lag` per group — no positional window, so gaps in
  * the series simply contribute no pair (missing days don't fabricate
  * adjacency, the honest treatment; densify first with
  * [[DenseSeries]]-style zero-fill when calendar adjacency is wanted).
  * The correlation itself is [[GroupedTrend.correlation]] over the pair
  * frame — the same five exact DECIMAL(38,0) partials, corr_num /
  * var_x / var_y hashing cross-engine and one final IEEE double.
  *
  * Scale shape: one equi-join on (group, t) — 8-byte keys, AQE-planned —
  * then the decomposable-aggregate posture: a whale group is map-side
  * accumulation only. NULL groups are a real stratum (null-safe join).
  *
  * Contract: (group, idx) should identify one observation — duplicate
  * indices cross-pair (both engines identically, but the statistic stops
  * being an autocorrelation); NULL idx/value rows drop.
  */
object Autocorr {

  /** (group, n, corr_num, var_x, var_y, corr) over the lag-k pair frame:
    * n is the PAIR count, x the lagged value, y the current.
    */
  def lagCorrelation(df: DataFrame, groupCol: String, idxCol: String,
                     valueCol: String, lag: Long): DataFrame = {
    require(lag >= 1, s"lag must be positive, got $lag")
    Seq(idxCol, valueCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "lagCorrelation"))
    val cur = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__y"))
      .localCheckpoint(true)
    val lagged = cur.select(col(groupCol).as("__g2"),
      (col("__t") + lag).as("__t2"), col("__y").as("__x"))
    val pairsF = cur.join(lagged,
      col(groupCol) <=> col("__g2") && col("__t") === col("__t2"))
    GroupedTrend.correlation(pairsF, Seq(groupCol), "__x", "__y")
  }

  /** DuckDB replay of [[lagCorrelation]] — same pair join, then the
    * [[GroupedTrend.correlationOracle]] over the pair frame.
    */
  def oracleSql(table: String, groupCol: String, idxSql: String,
                valueSql: String, lag: Long): String = {
    val series = s"SELECT $groupCol, CAST($idxSql AS BIGINT) AS t, " +
      s"CAST($valueSql AS BIGINT) AS v FROM $table " +
      s"WHERE ($idxSql) IS NOT NULL AND ($valueSql) IS NOT NULL"
    val pairSql = s"""SELECT a.$groupCol, b.v AS x, a.v AS y
FROM ($series) a JOIN ($series) b
  ON a.$groupCol IS NOT DISTINCT FROM b.$groupCol AND a.t = b.t + $lag"""
    GroupedTrend.correlationOracle(s"($pairSql) ac", Seq(groupCol), "x", "y")
  }
}
