package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Per-group z-score standardization and outlier flagging — the numeric
  * screen a curation pipeline runs over quality scores, token counts, and
  * feature columns before training: standardize within a stratum (source,
  * language), flag rows far from their group's distribution.
  *
  * Cross-engine determinism is the design constraint: group sums and
  * sums-of-squares accumulate in DECIMAL (exact, order-independent), are
  * cast to double ONCE, and the remaining arithmetic — mean = s/n,
  * var = ss/n − mean², std = √var, z = (x − mean)/std — is a fixed
  * sequence of IEEE-754 double ops (division, multiply, subtract, and a
  * correctly-rounded sqrt) that every conforming engine evaluates to the
  * same bits. The emitted `z_scaled = ⌊z·10⁴⌋` is therefore hashable
  * across engines — the [[graft.functions.QuantizedDot]] quantization
  * contract applied to standardization.
  *
  * Scale shape (100 TB): group moments are ONE partial-agg'd shuffle of
  * three decimals per (group, partition) — the decomposable-aggregate
  * posture, whale-group safe; the moments table (|groups| rows) broadcast
  * joins back and scoring is scan-stage arithmetic. No window, no second
  * pass over row data.
  *
  * Degenerate groups: std = 0 (constant group, or a single row) yields
  * NULL z — no row of such a group is an outlier.
  */
object Outliers {

  /** Input columns plus `z_scaled` (⌊z·10⁴⌋, NULL when the group std is
    * zero) and `is_outlier` (|z| > threshold, false when z is NULL).
    */
  def zscore(df: DataFrame, groupCol: String, valueCol: String,
             threshold: Double = 3.0): DataFrame = {
    val dec = col(valueCol).cast(DecimalType(18, 2))
    val stats = df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).cast(LongType).as("__cnt"),
      sum(dec).as("__s"),
      sum(dec * dec).as("__ss"))
    val n = col("__cnt").cast(DoubleType)
    val mean = col("__s").cast(DoubleType) / n
    val variance = col("__ss").cast(DoubleType) / n - mean * mean
    val std = sqrt(variance)
    val z = (col(valueCol).cast(DoubleType) - mean) / std
    // guard on variance (not std): a constant group's variance can round to
    // a tiny NEGATIVE double, and sqrt of a negative must never evaluate.
    // coalesce: a NULL value row has NULL z even in a live group — the
    // flag contract is "false whenever z is NULL", not NULL (which would
    // silently drop the row from a `where(!is_outlier)` keep-filter)
    df.join(broadcast(stats), groupCol)
      .withColumn("z_scaled",
        when(variance > 0.0, floor(z * lit(1e4)).cast(LongType)))
      .withColumn("is_outlier",
        coalesce(when(variance > 0.0, abs(z) > threshold), lit(false)))
      .drop("__cnt", "__s", "__ss")
  }

  /** DuckDB replay of [[zscore]]: the same decimal moments, the same
    * double expression sequence (operation-for-operation — IEEE
    * determinism needs the identical tree, not an algebraic equivalent).
    */
  def oracleSql(table: String, groupCol: String, valueCol: String,
                threshold: Double, keepCols: Seq[String]): String = {
    val cols = keepCols.map(c => s"t.$c").mkString(", ")
    s"""WITH g AS (SELECT $groupCol, count($valueCol) AS cnt,
  sum(CAST($valueCol AS DECIMAL(18,2))) AS s,
  sum(CAST($valueCol AS DECIMAL(18,2)) * CAST($valueCol AS DECIMAL(18,2))) AS ss
  FROM $table GROUP BY $groupCol),
d AS (SELECT $groupCol, CAST(cnt AS DOUBLE) AS n,
  CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean,
  CAST(ss AS DOUBLE) / CAST(cnt AS DOUBLE)
    - (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)) AS variance
  FROM g)
SELECT $cols,
  CASE WHEN d.variance > 0
    THEN CAST(floor((CAST(t.$valueCol AS DOUBLE) - d.mean) / sqrt(d.variance) * 1e4) AS BIGINT)
  END AS z_scaled,
  coalesce(CASE WHEN d.variance > 0
    THEN abs((CAST(t.$valueCol AS DOUBLE) - d.mean) / sqrt(d.variance)) > $threshold
  END, false) AS is_outlier
FROM $table t JOIN d ON t.$groupCol = d.$groupCol""".stripMargin
  }
}
