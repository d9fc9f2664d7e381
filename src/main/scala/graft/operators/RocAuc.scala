package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC per group via the Mann–Whitney rank statistic — the
  * threshold-free "does this score separate the classes at all"
  * readout beside [[Calibration.liftTable]]'s bucketed view: AUC =
  * P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), with NO curve
  * integration and no float anywhere until the final quantized ratio.
  *
  * The rank identity: with R₂ = Σ doubled average ranks of the
  * positives over the pooled group ([[Spearman]]'s integer-exact tie
  * device — 2·avgrank = 2·rank() + tiecount − 1), the doubled
  * Mann–Whitney numerator is `num2 = R₂ − n₊(n₊+1)` — an exact
  * non-negative integer counting each (pos, neg) pair twice and each
  * tie once — and AUC = num2 / (2·n₊·n₋), published as
  * `auc_q6 = ⌊10⁶·num2/(2·n₊·n₋)⌋` (one truncating division on
  * non-negatives; 500000 = coin flip, 1000000 = perfect separation).
  * The same statistic doubles as the Mann–Whitney U two-sample test's
  * exact numerator, so the operator is also the nonparametric
  * "did the distribution shift between cohorts" screen.
  *
  * Scale shape: ONE rank window per group (the [[Spearman]] rank
  * posture — a whale group sorts in one task; same two-level
  * decomposition applies if it matters), tie counts partial-agg'd on
  * (group, score), then a one-shuffle three-partial aggregate; moments
  * ride DECIMAL(38,0) (R₂ ≲ 2n² outgrows Long at ~10⁹ rows/group).
  *
  * Contracts: `label` must evaluate to 0/1 (anything else fails the
  * plan loudly — a mislabeled frame must not silently half-count);
  * NULL score or NULL label rows drop BEFORE ranking on both engines;
  * one-class groups (n₊ = 0 or n₋ = 0) report NULL AUC — separation
  * of nothing is undefined, never 0 or 1.
  */
object RocAuc {

  val Scale = 1000000L

  /** (groupCols*, n_pos, n_neg, auc_q6). */
  def auc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
          label: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val y0 = label.cast("long")
    val y = when(y0.isNull || y0 === 0L || y0 === 1L, y0)
      .otherwise(raise_error(concat(
        lit("RocAuc: label must be 0/1, got "), y0.cast("string"))))
    val rank2 =
      (lit(2) * rank().over(Window.partitionBy(g: _*).orderBy(col(scoreCol))) +
        count(lit(1)).over(Window.partitionBy(g :+ col(scoreCol): _*)) - 1)
        .cast("long")
    val ranked = df
      .select(df.columns.map(col) :+ y.as("__y"): _*)
      .where(col(scoreCol).isNotNull && col("__y").isNotNull)
      .withColumn("__r2", rank2)
    val agg = ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__y")).as("__np"),
        sum(when(col("__y") === 1L, col("__r2")).otherwise(lit(0L)))
          .cast(dec).as("__r2p"))
    finish(agg, groupCols)
  }

  /** [[auc]] through the two-level [[RankDecomp]] decomposition —
    * identical output at EVERY bucket width (same identity, same
    * oracle), with NO per-group rank window and no row-level rank join
    * either: rows collapse to the (group, score) mass table (one
    * partial-agg'd shuffle carrying count + positive count), ranks
    * decompose over that table with (group, bucket) windows, and the
    * positive rank sum is Σ npos(v)·r2(v) — a whale group never sorts
    * or even materializes per-row ranks. Integral scores required.
    */
  def aucBucketed(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                  label: Column, bucketWidth: Long): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    graft.Guards.requireIntegral(df, scoreCol, "aucBucketed")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val y0 = label.cast("long")
    val y = when(y0.isNull || y0 === 0L || y0 === 1L, y0)
      .otherwise(raise_error(concat(
        lit("RocAuc: label must be 0/1, got "), y0.cast("string"))))
    val collapsed = df
      .select(df.columns.map(col) :+ y.as("__y"): _*)
      .where(col(scoreCol).isNotNull && col("__y").isNotNull)
      .groupBy((g :+ col(scoreCol).cast("long").as("__v")): _*)
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__cp"))
    val withR2 = RankDecomp.doubledRankMap(
      collapsed, groupCols, "__v", "__c", bucketWidth)
    val agg = withR2.groupBy(g: _*)
      .agg(sum(col("__c")).as("__n"),
        sum(col("__cp")).as("__np"),
        sum(col("__cp").cast(dec) * col("__r2").cast(dec))
          .cast(dec).as("__r2p"))
    finish(agg, groupCols)
  }

  /** The shared readout: (n, np, Σ positive doubled ranks) → AUC. */
  private def finish(agg: DataFrame,
                     groupCols: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val np = col("__np").cast(dec)
    val nn = (col("__n") - col("__np")).cast(dec)
    val num2 = col("__r2p") - np * (np + lit(1).cast(dec))
    val den = lit(2).cast(dec) * np * nn
    agg.select(g ++ Seq(
      col("__np").as("n_pos"),
      (col("__n") - col("__np")).as("n_neg"),
      when(col("__np") === 0L || col("__n") === col("__np"),
        lit(null).cast("long"))
        .otherwise(
          call_function("div", num2 * lit(Scale).cast(dec), den)
            .cast("long"))
        .as("auc_q6")): _*)
  }

  /** DuckDB replay of [[auc]] — the same doubled ranks, HUGEINT
    * magnitudes, `//` ≡ `div` on the non-negative numerator.
    */
  def oracleSql(table: String, groupCols: Seq[String], scoreSql: String,
                labelSql: String): String = {
    val g = groupCols.mkString(", ")
    s"""WITH r AS (
  SELECT $g, CAST($labelSql AS BIGINT) AS y,
    2 * rank() OVER (PARTITION BY $g ORDER BY ($scoreSql))
      + count(*) OVER (PARTITION BY $g, ($scoreSql)) - 1 AS r2
  FROM $table
  WHERE ($scoreSql) IS NOT NULL AND ($labelSql) IS NOT NULL),
a AS (
  SELECT $g, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(y) AS HUGEINT) AS np,
    CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS HUGEINT) AS r2p
  FROM r GROUP BY $g)
SELECT $g, CAST(np AS BIGINT) AS n_pos, CAST(n - np AS BIGINT) AS n_neg,
  CASE WHEN np = 0 OR np = n THEN NULL
       ELSE CAST(((r2p - np * (np + 1)) * ${Scale}) // (2 * np * (n - np))
         AS BIGINT) END AS auc_q6
FROM a ORDER BY $g"""
  }
}
