package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cumulative-unique growth curve — per (group, time bucket): how many
  * entities appeared for the FIRST time, and how many distinct
  * entities have appeared to date. The signup/adoption curve beside
  * [[TrailingActives]]' sliding DAU/WAU windows (actives ask "how many
  * this window"; growth asks "how many EVER, by when") — and the
  * exact curve a `count(DISTINCT) OVER (ORDER BY t)` cannot express
  * in either engine without quadratic recount.
  *
  * The trick is the standard first-occurrence collapse: cumulative
  * distinct to bucket b ≡ count of entities whose FIRST bucket ≤ b —
  * one partial-agg'd min per (group, entity) (a 10⁸-event whale user
  * is one row downstream), one (group, bucket) count of debuts, one
  * running sum over the DENSE bucket spine (buckets where nobody
  * debuted still show the flat curve — the [[DenseSeries]]
  * explicit-zero posture, spine from each group's own observed
  * min..max bucket).
  *
  * Contracts: NULL entity/time rows drop; NULL groups are a real
  * stratum; buckets are integer epoch units supplied by the caller
  * (epoch days for a daily curve — no engine date function drift).
  */
object GrowthCurve {

  /** (groupCols*, bucket, new_entities, cum_entities). */
  def cumulativeUniques(df: DataFrame, groupCols: Seq[String],
                        entityCol: String, bucketCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must not be empty")
    graft.Guards.requireIntegral(df, bucketCol, "cumulativeUniques")
    val g = groupCols.map(col)
    val firsts = df
      .where(col(entityCol).isNotNull && col(bucketCol).isNotNull)
      .groupBy(g :+ col(entityCol).as("__e"): _*)
      .agg(min(col(bucketCol).cast("long")).as("__fb"))
    val debuts = firsts
      .groupBy(g :+ col("__fb").as("bucket"): _*)
      .agg(count(lit(1)).as("new_entities"))
      .localCheckpoint(true)
    val spine = debuts
      .groupBy(groupCols.map(c => col(c).as(s"__s_$c")): _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(groupCols.map(c => col(s"__s_$c")) :+
        explode(sequence(col("__lo"), col("__hi"))).as("__b"): _*)
    val joinCond = groupCols.map(c => col(s"__s_$c") <=> col(c))
      .reduce(_ && _) && col("__b") === col("bucket")
    val dense = spine.join(debuts, joinCond, "left_outer")
      .select(groupCols.map(c => col(s"__s_$c").as(c)) :+
        col("__b").as("bucket") :+
        coalesce(col("new_entities"), lit(0L)).as("new_entities"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense.withColumn("cum_entities", sum(col("new_entities")).over(w))
  }

  /** DuckDB replay of [[cumulativeUniques]]. */
  def oracleSql(table: String, groupCols: Seq[String], entitySql: String,
                bucketSql: String): String = {
    val g = groupCols.mkString(", ")
    val nd = groupCols.map(c => s"sp.$c IS NOT DISTINCT FROM d.$c")
      .mkString(" AND ")
    val spg = groupCols.map(c => s"sp.$c").mkString(", ")
    s"""WITH f AS (
  SELECT $g, $entitySql AS e, min(CAST($bucketSql AS BIGINT)) AS fb
  FROM $table
  WHERE ($entitySql) IS NOT NULL AND ($bucketSql) IS NOT NULL
  GROUP BY $g, e),
d AS (SELECT $g, fb AS bucket, CAST(count(*) AS BIGINT) AS new_entities
  FROM f GROUP BY $g, fb),
sp AS (SELECT $g, unnest(generate_series(min(bucket), max(bucket)))
    AS bucket FROM d GROUP BY $g),
dense AS (
  SELECT $spg, sp.bucket,
    coalesce(d.new_entities, 0) AS new_entities
  FROM sp LEFT JOIN d ON $nd AND sp.bucket = d.bucket)
SELECT $g, bucket, new_entities,
  CAST(sum(new_entities) OVER (PARTITION BY $g ORDER BY bucket ASC
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_entities
FROM dense ORDER BY $g, bucket"""
  }
}
