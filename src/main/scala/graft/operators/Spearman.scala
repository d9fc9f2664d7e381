package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Spearman rank correlation per group — the monotone-association
  * sibling of [[GroupedTrend.correlation]]'s Pearson: is y monotonically
  * related to x, regardless of the shape? The robust screen for
  * outlier-heavy or nonlinear pairs (price vs quantity, score vs rank)
  * where Pearson's linearity assumption lies.
  *
  * Spearman IS Pearson on average ranks, and with ties the popular
  * `1 − 6Σd²/(n(n²−1))` shortcut is WRONG — so this computes true
  * average ranks and delegates to the exact Pearson moment machinery.
  * Average ranks of a tie run are half-integers; doubling makes them
  * exact integers with no float anywhere: `2·avgrank = 2·rank() +
  * tiecount − 1` (the average of consecutive integers a..b is
  * (a+b)/2, and rank() gives a, a+tiecount−1 gives b). Scaling both
  * axes by 2 leaves the correlation untouched. Moments ride
  * DECIMAL(38,0) (4n⁴ magnitude — Long dies at ~60k rows/group) and
  * publish as (corr_num, var_x, var_y) alongside the float `corr`,
  * the [[GroupedTrend.correlation]] contract; the integers gate, the
  * float is spec-covered.
  *
  * Scale shape: two rank windows per group (one per axis) — the RANK
  * posture: a whale group's ranking is one task's sort, same residual
  * as weightedMedian's cumulative axis (SCALING.md); the tie counts
  * are partial-agg'd window counts over (group, value), and everything
  * after ranking is the ONE-shuffle five-partial Pearson aggregate.
  *
  * Contracts: rows with NULL x or y drop (a rank over an unknown value
  * is undefined — and dropping must happen BEFORE ranking on both
  * engines, or rank positions diverge); `corr` is NULL when either
  * axis is constant (zero variance — Spearman undefined); ranks are
  * dense within each group independently.
  */
object Spearman {

  /** The doubled-average-rank columns `__rx2` / `__ry2` — exposed for
    * spec inspection; integer-exact tie handling.
    */
  def ranked(df: DataFrame, groupCols: Seq[String], xCol: String,
             yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val g = groupCols.map(col)
    def rank2(c: String) =
      lit(2) * rank().over(Window.partitionBy(g: _*).orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy(g :+ col(c): _*)) - 1
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("__rx2", rank2(xCol).cast("long"))
      .withColumn("__ry2", rank2(yCol).cast("long"))
  }

  /** (groupCols*, n, corr_num, var_x, var_y, corr) with the moments
    * taken over doubled average ranks.
    */
  def correlation(df: DataFrame, groupCols: Seq[String], xCol: String,
                  yCol: String): DataFrame =
    GroupedTrend.correlation(ranked(df, groupCols, xCol, yCol),
      groupCols, "__rx2", "__ry2")

  /** [[ranked]] through the two-level [[RankDecomp]] decomposition —
    * identical `__rx2`/`__ry2` at EVERY bucket width (one identity, one
    * oracle), but no per-group rank window: each axis builds a
    * distinct-value rank MAP (windows partitioned by (group, bucket))
    * and rows join it on the 8-byte (group, value) key, so a whale
    * group never sorts in one task. Integral axes required (the map
    * join keys on the exact value). Output carries (groupCols, xCol,
    * yCol, __rx2, __ry2) — the moment machinery's needs — not the full
    * input row (unlike the window-form [[ranked]]).
    */
  def rankedBucketed(df: DataFrame, groupCols: Seq[String], xCol: String,
                     yCol: String, xBucketWidth: Long,
                     yBucketWidth: Long): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    Seq(xCol, yCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "rankedBucketed"))
    val g = groupCols.map(col)
    // three consumers (row side + two mass builds) — materialize the
    // filtered projection once instead of re-running the scan per leg
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((g :+ col(xCol) :+ col(yCol)).distinct: _*)
      .localCheckpoint(true)
    def rmap(c: String, w: Long, tag: String): DataFrame =
      RankDecomp.doubledRankMap(
        base.groupBy((g :+ col(c).cast("long").as("__v")): _*)
          .agg(count(lit(1)).as("__c")),
        groupCols, "__v", "__c", w)
        .select((groupCols.zipWithIndex.map { case (gc, i) =>
          col(gc).as(s"__${tag}g$i") } ++
          Seq(col("__v").as(s"__${tag}v"), col("__r2").as(s"__${tag}r2"))): _*)
    def joinCond(tag: String, vc: String) =
      groupCols.zipWithIndex.map { case (gc, i) =>
        col(gc) <=> col(s"__${tag}g$i") }.reduce(_ && _) &&
        col(vc).cast("long") === col(s"__${tag}v")
    base
      .join(rmap(xCol, xBucketWidth, "x"), joinCond("x", xCol))
      .join(rmap(yCol, yBucketWidth, "y"), joinCond("y", yCol))
      .withColumn("__rx2", col("__xr2"))
      .withColumn("__ry2", col("__yr2"))
      .drop((Seq("__xv", "__yv", "__xr2", "__yr2") ++
        groupCols.indices.flatMap(i => Seq(s"__xg$i", s"__yg$i"))): _*)
  }

  /** [[correlation]] through the decomposed rank path — gate-equal to
    * the window form at every bucket width.
    */
  def correlationBucketed(df: DataFrame, groupCols: Seq[String],
                          xCol: String, yCol: String, xBucketWidth: Long,
                          yBucketWidth: Long): DataFrame =
    GroupedTrend.correlation(
      rankedBucketed(df, groupCols, xCol, yCol, xBucketWidth, yBucketWidth),
      groupCols, "__rx2", "__ry2")

  /** DuckDB replay: the same doubled ranks as a derived table fed to
    * the shared Pearson moment oracle — one rank definition per engine,
    * one moment definition total.
    */
  def oracleSql(table: String, groupCols: Seq[String], xSql: String,
                ySql: String): String = {
    val g = groupCols.mkString(", ")
    val ranks =
      s"""(SELECT $g,
    2 * rank() OVER (PARTITION BY $g ORDER BY ($xSql))
      + count(*) OVER (PARTITION BY $g, ($xSql)) - 1 AS rx2,
    2 * rank() OVER (PARTITION BY $g ORDER BY ($ySql))
      + count(*) OVER (PARTITION BY $g, ($ySql)) - 1 AS ry2
  FROM $table
  WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL) spearman_ranks"""
    GroupedTrend.correlationOracle(ranks, groupCols, "rx2", "ry2")
  }
}
