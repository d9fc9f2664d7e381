package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pareto / ABC classification — "which 20% of items carry 80% of the
  * value": rank items by value descending, accumulate their share of the
  * group total, and band them A/B/C at cumulative-share thresholds (the
  * 80/95 inventory-management defaults). The readout behind "top
  * customers cover X% of revenue", dedup-savings concentration, and the
  * long-tail decision every curation budget makes.
  *
  * Exactness: shares never materialize as floats — the class test is the
  * cross-multiplied `(cum − v)·100 < threshold·total` on DECIMAL(38,0),
  * and the reported `cum_share_bp` is one non-negative floor division. The
  * (value DESC, id ASC) rank is total, so banding is deterministic under
  * ties. An item's class comes from the cumulative share BEFORE it (an
  * item is A when it is still needed to reach the A threshold) — so the
  * first item is always A, even a 99%-of-total whale. Non-positive and
  * NULL values carry no share and drop (a Pareto of losses needs
  * magnitudes — feed abs upstream).
  *
  * Scale shape: one per-group rank window (items-per-group cardinality)
  * + a group-totals broadcast; the rank posture's wall-clock contract.
  */
object Pareto {

  /** (groupCol, idCol, value, rank, cum_share_bp, abc) per positive-value
    * row; abc ∈ {'A','B','C'} at `aPct`/`bPct` cumulative-share cuts.
    */
  def abcClassify(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, aPct: Long = 80L, bPct: Long = 95L): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "abcClassify")
    require(aPct > 0 && bPct > aPct && bPct <= 100,
      s"need 0 < aPct($aPct) < bPct($bPct) <= 100")
    val vals = df.where(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(groupCol), col(idCol), col(valueCol).cast(LongType).as("__v"))
    val ord = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rk = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").desc, col(idCol))
    val whole = Window.partitionBy(col(groupCol))
    val cum = col("__cum").cast("decimal(38,0)")
    val tot = col("__tot").cast("decimal(38,0)")
    vals
      .withColumn("__cum", graft.ExactSum.sumLongOver(col("__v"), ord))
      .withColumn("__tot", graft.ExactSum.sumLongOver(col("__v"), whole))
      .withColumn("rank", row_number().over(rk).cast(LongType))
      .select(col(groupCol), col(idCol), col("__v").as("value"), col("rank"),
        expr("CAST((CAST(__cum AS DECIMAL(38,0)) * 10000) div __tot AS BIGINT)")
          .as("cum_share_bp"),
        when((cum - col("__v")) * 100 < tot * aPct, "A")
          .when((cum - col("__v")) * 100 < tot * bPct, "B")
          .otherwise("C").as("abc"))
  }

  /** DuckDB replay of [[abcClassify]]. */
  def oracleSql(table: String, groupCol: String, idCol: String,
                valueSql: String, aPct: Long = 80L, bPct: Long = 95L): String =
    s"""WITH v AS (SELECT $groupCol, $idCol, CAST($valueSql AS BIGINT) AS v
  FROM $table WHERE ($valueSql) IS NOT NULL AND ($valueSql) > 0),
w AS (SELECT $groupCol, $idCol, v,
    row_number() OVER ww AS rank,
    sum(CAST(v AS DECIMAL(38,0))) OVER (ww ROWS UNBOUNDED PRECEDING) AS cum,
    sum(CAST(v AS DECIMAL(38,0))) OVER (PARTITION BY $groupCol) AS tot
  FROM v
  WINDOW ww AS (PARTITION BY $groupCol ORDER BY v DESC, $idCol))
SELECT $groupCol, $idCol, v AS value, CAST(rank AS BIGINT) AS rank,
  CAST((CAST(cum AS HUGEINT) * 10000) // CAST(tot AS HUGEINT) AS BIGINT) AS cum_share_bp,
  CASE WHEN (cum - v) * 100 < tot * $aPct THEN 'A'
       WHEN (cum - v) * 100 < tot * $bPct THEN 'B'
       ELSE 'C' END AS abc
FROM w ORDER BY $groupCol, rank""".stripMargin
}
