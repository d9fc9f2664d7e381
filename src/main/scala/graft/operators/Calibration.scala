package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score-decile lift / calibration table — the standard model-quality
  * readout ("does the top decile convert 4× baseline? does predicted
  * probability match observed rate per bucket?"): rank rows into `k`
  * exact NTILE buckets by a score, then per bucket the positive count,
  * observed rate and lift vs the global base rate, all as exact
  * quantized integers.
  *
  *   rate_scaled = ⌊SCALE·pos/n⌋,
  *   lift_scaled = ⌊SCALE·pos·N/(n·POS)⌋  (cross-multiplied, one
  *   truncating division on non-negatives — no float ratio anywhere).
  *
  * Scale shape: [[QuantileBuckets.ntileExact]]'s range-exchange +
  * dense-index bucketing (no global window), then one partial-agg'd
  * k-row aggregate; totals re-aggregate the k-row table and broadcast
  * back.
  */
object Calibration {

  val Scale = 1000000L

  /** (bucket 1..k, n, n_pos, rate_scaled, lift_scaled) — bucket 1 is the
    * LOWEST score (ascending NTILE; read top-decile lift from bucket k).
    * `label` must be a boolean/0-1 expression; NULL score or id rows drop.
    */
  def liftTable(df: DataFrame, scoreCol: String, idCol: String,
                label: Column, k: Int = 10): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val bucketed = QuantileBuckets.ntileExact(
      df.where(col(scoreCol).isNotNull && col(idCol).isNotNull)
        .select(col(idCol), col(scoreCol), label.cast("long").as("__y")),
      scoreCol, idCol, k)
    val perBucket = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .localCheckpoint(false)
    val totals = perBucket.agg(sum(col("n")).as("__N"), sum(col("n_pos")).as("__P"))
    perBucket.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr(s"(n_pos * $Scale) div n").as("rate_scaled"),
        when(col("__P") === 0, lit(null).cast("long"))
          // n_pos·N·SCALE exceeds long range on a 10⁹-row frame — route
          // the magnitude through DECIMAL(38,0) (lift itself is ≤ k·SCALE)
          .otherwise(expr(
            s"CAST((CAST(n_pos AS DECIMAL(38,0)) * __N * $Scale) div " +
              "CAST(n * __P AS DECIMAL(38,0)) AS BIGINT)")).as("lift_scaled"))
  }

  /** DuckDB replay of [[liftTable]] — window NTILE over the same
    * (score, id) order, same cross-multiplied integer ratios.
    */
  def liftOracle(table: String, scoreSql: String, idCol: String,
                 labelSql: String, k: Int = 10): String =
    s"""WITH b AS (SELECT ntile($k) OVER (ORDER BY $scoreSql, $idCol) AS bucket,
    CAST($labelSql AS BIGINT) AS y
  FROM $table WHERE ($scoreSql) IS NOT NULL AND $idCol IS NOT NULL),
p AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM b GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(n_pos) AS BIGINT) AS pp FROM p)
SELECT CAST(bucket AS BIGINT) AS bucket, n, n_pos,
  CAST((n_pos * $Scale) // n AS BIGINT) AS rate_scaled,
  CASE WHEN pp = 0 THEN NULL
       ELSE CAST((n_pos * nn * $Scale) // (n * pp) AS BIGINT) END AS lift_scaled
FROM p, t ORDER BY bucket""".stripMargin
}
