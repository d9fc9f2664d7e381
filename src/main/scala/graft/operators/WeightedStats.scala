package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Weighted order statistics — "the median price weighted by units sold",
  * "the median latency weighted by request volume": the plain median
  * answers what the typical ROW looks like; the weighted median answers
  * what the typical UNIT experienced, which is usually the question a
  * revenue or traffic readout is actually asking.
  *
  * Definition (discrete, no interpolation): the weighted median is the
  * smallest value v whose cumulative weight reaches half the total —
  * `min { v : 2·cw(v) ≥ W }` with `cw` accumulated over distinct values
  * in ascending order. Cross-multiplied integers end to end (weights sum
  * in DECIMAL(38,0)); reduces to the ⌈n/2⌉-th smallest at unit weights —
  * [[Outliers.madOutliers]]'s lower-median parity.
  *
  * Scale shape: rows first collapse to (group, value) weight sums — a
  * partial-agg'd shuffle, so a million rows of one value cost one row
  * downstream — then one per-group cumulative window over DISTINCT
  * values (the rank posture, value-cardinality-sized, not row-sized) and
  * a first-crossing reduction. Rows with NULL value/weight or
  * non-positive weight carry no mass and drop (documented contract).
  */
object WeightedStats {

  /** (groupCol, total_weight, weighted_median) per group. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    Seq(valueCol, weightCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "weightedMedian"))
    val mass = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(groupCol), col(valueCol).cast(LongType).as("__v"))
      .agg( // limb sums: identical decimal(38,0), codegen'd long partials
        graft.ExactSum.sumLong(col(weightCol).cast(LongType)).as("__w"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(groupCol))
    mass
      .withColumn("__cw", sum(col("__w")).over(ord))
      .withColumn("__tw", sum(col("__w")).over(whole))
      .where(col("__cw") * 2 >= col("__tw"))
      .groupBy(col(groupCol))
      .agg(max(col("__tw")).cast(LongType).as("total_weight"),
        min(col("__v")).as("weighted_median"))
  }

  /** [[weightedMedian]] with the cumulative axis decomposed two-level
    * (the [[graft.text.Packing]] prefix-sum posture): the plain form's
    * per-group cumulative window is value-cardinality-sized, which IS
    * row-sized on one task when the value domain is near-unique (a group
    * with 10⁹ distinct values inherits the rank posture's single-task
    * wall-clock). Here values bucket by `value div bucketWidth` (integral
    * div is monotone, so (bucket, value) order ≡ value order): level 1
    * cumsums WITHIN each (group, bucket) — parallel across buckets —
    * and level 2 prefix-sums the per-bucket totals (occupied-buckets-
    * sized, partial-agg'd before the window). `cw = bucket_offset +
    * within_cum` is algebraically the plain running sum, so the result
    * is bucketWidth-independent (spec-pinned) and the same oracle gates
    * both forms. Group joins are null-safe — a NULL group is a real
    * stratum, as in the plain form's groupBy.
    *
    * Residual: a single VALUE-RANGE hot spot (most distinct values in
    * one bucket) re-concentrates level 1 — pick bucketWidth ≈
    * domain-span / √cardinality when the domain is known.
    */
  def weightedMedianBucketed(df: DataFrame, groupCol: String,
                             valueCol: String, weightCol: String,
                             bucketWidth: Long): DataFrame =
    weightedQuantileBucketed(df, groupCol, valueCol, weightCol,
      qNum = 1L, qDen = 2L, bucketWidth = bucketWidth)
      .withColumnRenamed("weighted_quantile", "weighted_median")

  /** The general weighted quantile — "the P90 latency weighted by
    * request volume": smallest v with `qDen·cw(v) ≥ qNum·W` (the
    * first-crossing rule at fraction qNum/qDen; 1/2 IS the median).
    * Integer (num, den) fractions keep the crossing exact on both
    * engines — no float q ever multiplies a weight.
    */
  def weightedQuantileBucketed(df: DataFrame, groupCol: String,
                               valueCol: String, weightCol: String,
                               qNum: Long, qDen: Long,
                               bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive, got $bucketWidth")
    require(qDen >= 1 && qNum >= 1 && qNum <= qDen,
      s"quantile $qNum/$qDen must be a fraction in (0, 1]")
    Seq(valueCol, weightCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "weightedQuantileBucketed"))
    val mass = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(groupCol), col(valueCol).cast(LongType).as("__v"))
      .agg( // limb sums: identical decimal(38,0), codegen'd long partials
        graft.ExactSum.sumLong(col(weightCol).cast(LongType)).as("__w"))
      .withColumn("__b", call_function("div", col("__v"), lit(bucketWidth)))
      .localCheckpoint(true)
    val within = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketTotals = mass.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w")).as("__bt"))
    val bOrd = Window.partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketTotals
      .withColumn("__boff",
        coalesce(sum(col("__bt")).over(bOrd), lit(0).cast("decimal(38,0)")))
      .select(col(groupCol).as("__g2"), col("__b").as("__b2"), col("__boff"))
    val grpTot = bucketTotals.groupBy(col(groupCol))
      .agg(sum(col("__bt")).as("__tw"))
      .select(col(groupCol).as("__g3"), col("__tw"))
    mass
      .withColumn("__cwb", sum(col("__w")).over(within))
      .join(offs, col(groupCol) <=> col("__g2") && col("__b") === col("__b2"))
      .join(broadcast(grpTot), col(groupCol) <=> col("__g3"))
      .where((col("__boff") + col("__cwb")) * qDen >= col("__tw") * qNum)
      .groupBy(col(groupCol))
      .agg(max(col("__tw")).cast(LongType).as("total_weight"),
        min(col("__v")).as("weighted_quantile"))
  }

  /** DuckDB replay of [[weightedMedian]] / [[weightedMedianBucketed]] —
    * same mass collapse, same first-crossing rule (the decomposition is
    * algebraically the plain running sum, so ONE oracle gates both).
    */
  def oracleSql(table: String, groupCol: String, valueSql: String,
                weightSql: String): String =
    quantileOracleSql(table, groupCol, valueSql, weightSql, 1L, 2L,
      "weighted_median")

  /** DuckDB replay of [[weightedQuantileBucketed]] at qNum/qDen. */
  def quantileOracleSql(table: String, groupCol: String, valueSql: String,
                        weightSql: String, qNum: Long, qDen: Long,
                        outCol: String = "weighted_quantile"): String =
    s"""WITH mass AS (SELECT $groupCol, CAST($valueSql AS BIGINT) AS v,
    sum(CAST($weightSql AS DECIMAL(38,0))) AS w
  FROM $table
  WHERE ($valueSql) IS NOT NULL AND ($weightSql) IS NOT NULL AND ($weightSql) > 0
  GROUP BY 1, 2),
c AS (SELECT $groupCol, v,
    sum(w) OVER (PARTITION BY $groupCol ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
    sum(w) OVER (PARTITION BY $groupCol) AS tw
  FROM mass)
SELECT $groupCol, CAST(max(tw) AS BIGINT) AS total_weight,
  min(v) AS $outCol
FROM c WHERE cw * $qDen >= tw * $qNum GROUP BY $groupCol
ORDER BY $groupCol""".stripMargin
}
