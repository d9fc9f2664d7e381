package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Kendall tau-b per group — the third member of the correlation
  * family ([[GroupedTrend.correlation]] measures linear association,
  * [[Spearman]] monotone association via ranks; tau-b counts PAIRS:
  * P(concordant) − P(discordant), the most outlier-robust of the three
  * and the one whose value has a direct betting interpretation). With
  * heavy ties (integer-valued metrics) tau-b's tie corrections are the
  * honest choice, and everything here is exact integer pair counting —
  * no rank construction at all.
  *
  * The decomposition: collapse rows to the distinct (x, y) CELL table
  * with counts (one partial-agg'd shuffle — the [[Contingency]] move),
  * then count pair classes over CELL pairs: concordant = Σ c₁c₂ over
  * cells with x₁<x₂ ∧ y₁<y₂ (times arrive once per unordered pair),
  * discordant likewise with y₁>y₂, x-only ties from per-x marginal
  * counts, y-only from per-y, both-tied within cells (c·(c−1)/2). The
  * identity conc + disc + tie_x + tie_y + tie_xy = n(n−1)/2 holds
  * exactly (spec-pinned). Published as the exact integer counts —
  * the decision-grade numbers; the float tau_b = (C−D)/√((n₀−n₁)(n₀−n₂))
  * rides along spec-covered (a √ never hash-gates, the Spearman
  * precedent).
  *
  * Scale contract (DECLARED, the EdJoin discipline): the cell self-join
  * is group-keyed with O(cells²) work per group — cells = |x-domain| ×
  * |y-domain|, so this is for BOUNDED-cardinality axes (flags, counts,
  * bucketed metrics); bucket continuous axes first (the L143 cutpoints
  * machinery). Counts ride DECIMAL(38,0) (n² outgrows Long at ~10⁹
  * rows/group).
  */
object KendallTau {

  /** (groupCols*, n, conc, disc, tie_x, tie_y, tie_xy, tau_b). */
  def tauB(df: DataFrame, groupCols: Seq[String], xCol: String,
           yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    Seq(xCol, yCol).foreach(c => graft.Guards.requireIntegral(df, c, "tauB"))
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy((g :+ col(xCol).cast("long").as("__x") :+
        col(yCol).cast("long").as("__y")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val rCond = groupCols.zipWithIndex.map { case (c, i) =>
      col(c) <=> col(s"__rg$i") }.reduce(_ && _)
    val right = cells.select((groupCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__rg$i") } ++
      Seq(col("__x").as("__x2"), col("__y").as("__y2"),
        col("__c").as("__c2"))): _*)
    // unordered cell pairs once: x strictly ascending pairs carry both
    // concordant (y up) and discordant (y down) classes
    val pairs = cells.join(right, rCond && col("__x") < col("__x2"))
      .groupBy(g: _*)
      .agg(
        sum(when(col("__y") < col("__y2"),
          col("__c").cast(dec) * col("__c2").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__conc"),
        sum(when(col("__y") > col("__y2"),
          col("__c").cast(dec) * col("__c2").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__disc"),
        sum(when(col("__y") === col("__y2"),
          col("__c").cast(dec) * col("__c2").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__tieYOnly"))
    // x-tied pairs (same x, different y) from per-x marginals minus
    // within-cell pairs; both-tied from within-cell pairs
    val perCell = cells.groupBy(g: _*)
      .agg(sum(col("__c")).as("__n"),
        sum((col("__c").cast(dec) * (col("__c") - 1).cast(dec)) / 2)
          .cast(dec).as("__tieXY"))
    val perX = cells.groupBy((g :+ col("__x")): _*)
      .agg(sum(col("__c")).as("__cx"))
      .groupBy(g: _*)
      .agg(sum((col("__cx").cast(dec) * (col("__cx") - 1).cast(dec)) / 2)
        .cast(dec).as("__pairsSameX"))
      .select((groupCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__xg$i") } :+ col("__pairsSameX")): _*)
    val xCond = groupCols.zipWithIndex.map { case (c, i) =>
      col(c) <=> col(s"__xg$i") }.reduce(_ && _)
    // BASE is perCell (every group with >=1 row) — a group whose x axis
    // has a single distinct value generates NO ascending cell pair, and
    // an inner join from `pairs` would silently drop it (the oracle
    // keeps it with zero conc/disc — caught in r10 review)
    val pairsR = pairs.select((groupCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__pg$i") } ++
      Seq(col("__conc"), col("__disc"), col("__tieYOnly"))): _*)
    val pCond = groupCols.zipWithIndex.map { case (c, i) =>
      col(c) <=> col(s"__pg$i") }.reduce(_ && _)
    val joined = perCell
      .join(pairsR, pCond, "left")
      .join(perX, xCond)
      .withColumn("__conc", coalesce(col("__conc"), lit(0).cast(dec)))
      .withColumn("__disc", coalesce(col("__disc"), lit(0).cast(dec)))
      .withColumn("__tieYOnly", coalesce(col("__tieYOnly"), lit(0).cast(dec)))
    val tieX = col("__pairsSameX") - col("__tieXY")
    val n0 = col("__n").cast(dec) * (col("__n") - 1).cast(dec) / 2
    val n1 = col("__pairsSameX")
    // y-tied total = tieYOnly (diff x) + tieXY (same cell) + ... same-x
    // same-y pairs ARE within-cell pairs, so per-y marginal = tieYOnly + tieXY
    val n2 = col("__tieYOnly") + col("__tieXY")
    // tau undefined when an axis is fully tied (zero denominator —
    // NULL, never a division error)
    val tau = when(n0 - n1.cast(dec) === 0 || n0 - n2.cast(dec) === 0,
        lit(null).cast("double"))
      .otherwise((col("__conc") - col("__disc")).cast("double") /
        sqrt((n0 - n1.cast(dec)).cast("double") * (n0 - n2.cast(dec)).cast("double")))
    joined.select((g ++ Seq(
      col("__n").as("n"),
      col("__conc").cast("long").as("conc"),
      col("__disc").cast("long").as("disc"),
      tieX.cast("long").as("tie_x"),
      col("__tieYOnly").cast("long").as("tie_y"),
      col("__tieXY").cast("long").as("tie_xy"),
      tau.as("tau_b"))): _*)
  }

  /** DuckDB replay of the exact counts (the float tau_b stays
    * spec-side — a √ never hash-gates).
    */
  def oracleSql(table: String, groupCols: Seq[String], xSql: String,
                ySql: String): String = {
    val gl = groupCols.mkString(", ")
    s"""WITH cells AS (
  SELECT $gl, CAST($xSql AS BIGINT) AS x, CAST($ySql AS BIGINT) AS y,
    CAST(count(*) AS HUGEINT) AS c
  FROM $table WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL
  GROUP BY ALL),
p AS (
  SELECT ${groupCols.map(c => s"a.$c").mkString(", ")},
    sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS conc,
    sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS disc,
    sum(CASE WHEN a.y = b.y THEN a.c * b.c ELSE 0 END) AS tie_y
  FROM cells a JOIN cells b
    ON ${groupCols.map(c => s"a.$c IS NOT DISTINCT FROM b.$c").mkString(" AND ")}
   AND a.x < b.x
  GROUP BY ALL),
m AS (
  SELECT $gl, CAST(sum(c) AS HUGEINT) AS n,
    sum(c * (c - 1) / 2) AS tie_xy
  FROM cells GROUP BY ALL),
px AS (
  SELECT $gl, sum(cx * (cx - 1) / 2) AS pairs_same_x
  FROM (SELECT $gl, x, sum(c) AS cx FROM cells GROUP BY ALL)
  GROUP BY ALL)
SELECT ${groupCols.map(c => s"m.$c").mkString(", ")},
  CAST(m.n AS BIGINT) AS n,
  CAST(COALESCE(p.conc, 0) AS BIGINT) AS conc,
  CAST(COALESCE(p.disc, 0) AS BIGINT) AS disc,
  CAST(px.pairs_same_x - m.tie_xy AS BIGINT) AS tie_x,
  CAST(COALESCE(p.tie_y, 0) AS BIGINT) AS tie_y,
  CAST(m.tie_xy AS BIGINT) AS tie_xy
FROM m
LEFT JOIN p ON ${groupCols.map(c => s"p.$c IS NOT DISTINCT FROM m.$c").mkString(" AND ")}
JOIN px ON ${groupCols.map(c => s"px.$c IS NOT DISTINCT FROM m.$c").mkString(" AND ")}
ORDER BY ${groupCols.map(c => s"m.$c").mkString(", ")}"""
  }
}
