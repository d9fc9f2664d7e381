package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Period-over-period rank movers — the leaderboard-diff readout behind
  * "who climbed, who fell" dashboards: each entity's value and rank in
  * two periods plus the rank delta. Ranks use `row_number` over
  * (value desc, entity asc) — the entity tiebreak makes every rank
  * unique and deterministic, so the delta is engine-exact (dense_rank
  * under ties would make "movement" depend on tie layout). Entities
  * present in only one period carry NULLs on the absent side and a NULL
  * delta (a debut isn't a climb from anywhere — downstream decides how
  * to badge new entries).
  *
  * Scale shape: one partial-agg'd (entity, period) sum; each period's
  * rank is ONE entity-cardinality window (the rank posture — entities,
  * not rows); the two period frames full-outer join null-safe on the
  * entity. NULL entities are a real stratum.
  */
object RankMovers {

  /** (entity, value_a, rank_a, value_b, rank_b, rank_delta) where
    * `rank_delta = rank_a − rank_b` (positive = climbed into period b).
    */
  def movers(df: DataFrame, entityCol: String, periodCol: String,
             valueCol: String, periodA: String, periodB: String): DataFrame = {
    require(periodA != periodB, "the two periods must differ")
    graft.Guards.requireIntegral(df, valueCol, "movers")
    val dec = "decimal(38,0)"
    def side(p: String, suffix: String) = {
      val w = Window.orderBy(col(s"value_$suffix").desc,
        col(s"entity_$suffix").asc)
      df.where(col(periodCol) === p && col(valueCol).isNotNull)
        .groupBy(col(entityCol).as(s"entity_$suffix"))
        .agg(sum(col(valueCol).cast("long").cast(dec)).cast("long")
          .as(s"value_$suffix"))
        .withColumn(s"rank_$suffix", row_number().over(w).cast("long"))
    }
    side(periodA, "a")
      .join(side(periodB, "b"), col("entity_a") <=> col("entity_b"),
        "full_outer")
      .select(coalesce(col("entity_a"), col("entity_b")).as("entity"),
        col("value_a"), col("rank_a"), col("value_b"), col("rank_b"),
        (col("rank_a") - col("rank_b")).as("rank_delta"))
  }

  /** DuckDB replay of [[movers]]. */
  def oracleSql(table: String, entitySql: String, periodSql: String,
                valueSql: String, periodA: String, periodB: String): String = {
    def side(p: String) =
      s"""SELECT $entitySql AS e, CAST(sum(CAST($valueSql AS HUGEINT)) AS BIGINT) AS v
  FROM $table WHERE ($periodSql) = '$p' AND ($valueSql) IS NOT NULL GROUP BY 1"""
    s"""WITH a0 AS (${side(periodA)}),
a AS (SELECT e, v, CAST(row_number() OVER (ORDER BY v DESC, e ASC NULLS FIRST) AS BIGINT) AS r FROM a0),
b0 AS (${side(periodB)}),
b AS (SELECT e, v, CAST(row_number() OVER (ORDER BY v DESC, e ASC NULLS FIRST) AS BIGINT) AS r FROM b0)
SELECT coalesce(a.e, b.e) AS entity, a.v AS value_a, a.r AS rank_a,
  b.v AS value_b, b.r AS rank_b, a.r - b.r AS rank_delta
FROM a FULL OUTER JOIN b ON a.e IS NOT DISTINCT FROM b.e
ORDER BY entity""".stripMargin
  }
}
