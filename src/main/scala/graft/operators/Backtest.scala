package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal-naive forecast backtest — the honesty check a metrics stack
  * runs before trusting any forecasting model: how well does "same day
  * last week" predict the series, and does anything beat it? Reported as
  * MASE (mean absolute scaled error, Hyndman 2006) — the seasonal
  * forecast's total absolute error scaled by the one-step naive
  * ("yesterday") error on the SAME evaluation days: below 10000 bp the
  * seasonal pattern is real signal; above, the series is effectively a
  * random walk and a dashboard "forecast" column would be theater.
  *
  * Computed on the DENSE calendar spine ([[DenseSeries.denseDaily]]) for
  * the same reason [[Deltas]] is: `lag(season)` over sparse rows means
  * "season PRESENT days ago", and a zero-filled outage day must count
  * as a (badly) predicted day, not silently vanish. Evaluation days are
  * those where BOTH lags exist (the first `season` spine days warm up).
  * All errors are exact integers; the two divisions (MAE, MASE bp) are
  * non-negative truncating div = floor on both engines, DECIMAL(38,0)
  * magnitudes. `mase_bp` is NULL when the naive error is zero (a
  * constant series admits no scaling — the standard MASE caveat).
  *
  * Scale shape: denseDaily's output-sized spine, ONE per-group lag
  * window over DAYS (day-cardinality, not row-cardinality), one
  * partial-agg'd groupBy.
  */
object Backtest {

  /** (groupCol, n_eval, sae_seasonal, sae_naive, mae_seasonal, mase_bp)
    * per group: total and mean absolute error of the `season`-day
    * seasonal-naive forecast, scaled against the 1-day naive.
    */
  def seasonalNaive(df: DataFrame, groupCol: String, dateCol: String,
                    valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 2, s"season must be at least 2 (1 IS the naive), got $season")
    val dense = DenseSeries.denseDaily(df, groupCol, dateCol, valueCol)
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("day"))
    val dec = "decimal(38,0)"
    dense
      .withColumn("__p1", lag(col("sum_value"), 1).over(ord))
      .withColumn("__ps", lag(col("sum_value"), season).over(ord))
      .where(col("__p1").isNotNull && col("__ps").isNotNull)
      .withColumn("__es", abs(col("sum_value").cast(dec) - col("__ps")))
      .withColumn("__e1", abs(col("sum_value").cast(dec) - col("__p1")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__es")).as("__sae_s"), sum(col("__e1")).as("__sae_1"))
      .select(col(groupCol), col("n_eval"),
        col("__sae_s").cast("long").as("sae_seasonal"),
        col("__sae_1").cast("long").as("sae_naive"),
        expr("CAST(__sae_s div n_eval AS BIGINT)").as("mae_seasonal"),
        when(col("__sae_1") =!= 0,
          expr("CAST((__sae_s * 10000) div __sae_1 AS BIGINT)"))
          .as("mase_bp"))
  }

  /** DuckDB replay of [[seasonalNaive]] — dense-spine CTE, same lags,
    * HUGEINT floor divisions.
    */
  def oracleSql(table: String, groupCol: String, dateCol: String,
                valueSql: String, season: Int = 7): String = {
    val dense = DenseSeries.denseDailyOracleBody(table, groupCol, dateCol, valueSql)
    s"""WITH dense AS ($dense),
lagged AS (
  SELECT $groupCol,
    abs(CAST(sum_value AS HUGEINT) - lag(sum_value, $season) OVER w) AS es,
    abs(CAST(sum_value AS HUGEINT) - lag(sum_value, 1) OVER w) AS e1
  FROM dense
  WINDOW w AS (PARTITION BY $groupCol ORDER BY day)),
agg AS (
  SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_eval,
    sum(es) AS sae_s, sum(e1) AS sae_1
  FROM lagged WHERE es IS NOT NULL AND e1 IS NOT NULL GROUP BY $groupCol)
SELECT $groupCol, n_eval,
  CAST(sae_s AS BIGINT) AS sae_seasonal, CAST(sae_1 AS BIGINT) AS sae_naive,
  CAST(sae_s // n_eval AS BIGINT) AS mae_seasonal,
  CASE WHEN sae_1 <> 0 THEN CAST((sae_s * 10000) // sae_1 AS BIGINT) END AS mase_bp
FROM agg ORDER BY $groupCol""".stripMargin
  }
}
