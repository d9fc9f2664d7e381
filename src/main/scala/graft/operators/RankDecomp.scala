package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level doubled-average-rank decomposition — the bucket-prefix
  * device of [[WeightedStats.weightedQuantileBucketed]] applied to
  * RANKING, closing the "rank-window residual" SCALING.md names for
  * [[Spearman]] and [[RocAuc]]: the plain rank window partitions by
  * group, so a whale group's sort is one task; here every window
  * partitions by (group, bucket) or runs over the bucket LIST, so the
  * largest partition is max(values-per-bucket, buckets-per-group) —
  * both chosen by `bucketWidth`, neither row-count-bounded.
  *
  * The identity (over the distinct-value mass table, c = rows at value
  * v): min-rank(v) = 1 + boff(b) + cwb(v) − c(v) with cwb the
  * within-bucket running count and boff the prefix sum of bucket totals,
  * so the doubled AVERAGE rank (the [[Spearman]] integer tie device,
  * 2·avgrank = 2·rank + c − 1) collapses to
  *
  *   __r2(v) = 2·(boff + cwb) − c + 1
  *
  * — exact Long integers throughout (2n fits at any real n). Bucketing
  * is truncating `div` by a positive width — monotone non-decreasing in
  * v, so bucket-major order ≡ value order and the prefix algebra is the
  * plain running count, which is why ONE oracle (the window form) gates
  * every width.
  */
object RankDecomp {

  /** Input: one row per (groupCols*, vCol) — the distinct-value mass
    * table, cCol = original rows at that value (> 0). Output: the input
    * columns (extras preserved) plus `__r2`, the doubled average rank of
    * vCol within its group. NULL group values are real strata (null-safe
    * join on the bucket offsets).
    */
  def doubledRankMap(mass0: DataFrame, groupCols: Seq[String], vCol: String,
                     cCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive, got $bucketWidth")
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val g = groupCols.map(col)
    val mass = mass0
      .withColumn("__b", call_function("div", col(vCol), lit(bucketWidth)))
      .localCheckpoint(true)
    val within = Window.partitionBy((g :+ col("__b")): _*).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketTotals = mass.groupBy((g :+ col("__b")): _*)
      .agg(sum(col(cCol)).as("__bt"))
    val bOrd = Window.partitionBy(g: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketTotals
      .withColumn("__boff", coalesce(sum(col("__bt")).over(bOrd), lit(0L)))
      .select((groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__og$i") } ++
        Seq(col("__b").as("__ob"), col("__boff"))): _*)
    val cond = groupCols.zipWithIndex.map { case (c, i) => col(c) <=> col(s"__og$i") }
      .reduce(_ && _) && col("__b") === col("__ob")
    mass.withColumn("__cwb", sum(col(cCol)).over(within))
      .join(offs, cond)
      .withColumn("__r2",
        (lit(2) * (col("__boff") + col("__cwb")) - col(cCol) + 1).cast("long"))
      .drop((Seq("__b", "__cwb", "__boff", "__ob") ++
        groupCols.indices.map(i => s"__og$i")): _*)
  }
}
