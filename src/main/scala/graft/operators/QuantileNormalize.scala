package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile (rank) normalization — make scores comparable
  * ACROSS groups whose raw scales differ (quality scores per language,
  * engagement per cohort, loss per domain): replace each value by its
  * scaled rank position within the group, `⌊SCALE·(rank−1)/(n−1)⌋` with
  * rank over (value, id) — a total order, so the result is deterministic
  * under ties and replayable by any engine as integers. A one-member
  * group maps to the midpoint SCALE/2 (its position is undefined;
  * midpoint keeps downstream thresholds symmetric).
  *
  * This is the feature-engineering twin of [[QuantileBuckets.ntileExact]]
  * (buckets quantize to B levels; this keeps the full resolution) and the
  * exact counterpart of sketch-based normalization (L89's KLL gives the
  * approximate streaming form).
  *
  * Scale shape: one hash shuffle on the group + a spill-backed per-group
  * sort window (the sessionized posture — a whale group costs wall-clock,
  * never memory, since rank carries no frame buffer); group sizes ride
  * the same window (count over the partition, no second shuffle).
  */
object QuantileNormalize {

  val Scale = 1000000L

  /** Input columns plus `rank_scaled` ∈ [0, SCALE]. Rows with a NULL
    * value or id drop (unrankable).
    */
  def rankNormalize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    idCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(idCol))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("rank_scaled",
        when(col("__n") === 1, lit(Scale / 2))
          .otherwise(expr(s"((__rk - 1) * $Scale) div (__n - 1)")))
      .drop("__rk", "__n")
  }

  /** DuckDB replay of [[rankNormalize]] — same (value, id) total order,
    * same floor division (non-negative operands), same singleton rule.
    */
  def rankNormalizeOracle(table: String, groupCols: Seq[String],
                          valueCol: String, idCol: String,
                          selectCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH r AS (SELECT ${selectCols.mkString(", ")},
  row_number() OVER (PARTITION BY $g ORDER BY $valueCol, $idCol) AS rk,
  count(*) OVER (PARTITION BY $g) AS n
  FROM $table WHERE $valueCol IS NOT NULL AND $idCol IS NOT NULL)
SELECT ${selectCols.mkString(", ")},
  CASE WHEN n = 1 THEN ${Scale / 2}
       ELSE CAST(((rk - 1) * $Scale) // (n - 1) AS BIGINT) END AS rank_scaled
FROM r ORDER BY $idCol""".stripMargin
  }
}
