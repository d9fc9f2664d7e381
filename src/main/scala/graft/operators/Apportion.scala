package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder apportionment — allocate EXACTLY N discrete slots
  * across groups proportionally to integer weights: the missing exact
  * half of the sampling/mixing family (L133's per-mille weights and
  * L65's fixed-N-per-group CAP a stream; this answers "this corpus
  * gets exactly 10⁶ training slots — how many per language so the
  * total is exactly 10⁶ and no group is off its quota by ≥ 1"). Float
  * rounding either over- or under-shoots N; the Hamilton method never
  * does: base_i = ⌊N·wᵢ/W⌋, and the N − Σbase leftover slots go to the
  * largest remainders N·wᵢ mod W (all on the SAME denominator, so the
  * comparison is exact; ties break by group ascending — deterministic,
  * never engine-arbitrary).
  *
  * All integers in DECIMAL(38,0) (N·w outgrows a long); W = 0 raises
  * loudly (allocating over zero total weight is a caller bug), negative
  * weights raise in-plan, NULL weight rows drop, NULL groups are a real
  * stratum. The remainder rank runs over GROUPS (allocation domains are
  * small — languages, sources, shards), one window.
  */
object Apportion {

  /** (groupCol, weight, seats) with Σseats = total exactly. */
  def largestRemainder(df: DataFrame, groupCol: String, weightCol: String,
                       total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    graft.Guards.requireIntegral(df, weightCol, "largestRemainder")
    val dec = "decimal(38,0)"
    val w = df.where(col(weightCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("weight"))
    val guardedW = when(col("weight") < 0L,
      raise_error(concat(lit("largestRemainder: negative weight "),
        col("weight").cast("string"), lit(" for group '"),
        col(groupCol).cast("string"), lit("'"))))
      .otherwise(col("weight"))
    val full = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val num = guardedW.cast(dec) * lit(total).cast(dec)
    val staged = w
      .withColumn("__W", sum(guardedW.cast(dec)).over(full))
      .withColumn("__chk",
        when(col("__W") === lit(0).cast(dec),
          raise_error(lit("largestRemainder: total weight is 0 — " +
            "nothing to apportion over")))
          .otherwise(lit(0L)))
      .withColumn("__base",
        call_function("div", num, col("__W")) + col("__chk"))
      .withColumn("__rem", num - col("__base").cast(dec) * col("__W"))
    val rk = Window.partitionBy()
      .orderBy(col("__rem").desc, col(groupCol).asc_nulls_first)
    staged
      .withColumn("__extra",
        lit(total) - sum(col("__base")).over(full))
      .withColumn("__rk", row_number().over(rk).cast("long"))
      .select(col(groupCol), col("weight"),
        (col("__base") + when(col("__rk") <= col("__extra"), 1L)
          .otherwise(0L)).as("seats"))
  }

  /** DuckDB replay of [[largestRemainder]] — HUGEINT arithmetic, same
    * deterministic remainder rank. `weightsSql` must yield
    * ($groupCol, w) pre-aggregated or raw (re-aggregated here).
    */
  def oracleSql(weightsSql: String, groupCol: String, total: Long): String =
    s"""WITH w AS (
  SELECT $groupCol, CAST(sum(w) AS HUGEINT) AS weight
  FROM ($weightsSql) WHERE w IS NOT NULL GROUP BY $groupCol),
t AS (SELECT w.*, sum(weight) OVER () AS tw,
    (CAST($total AS HUGEINT) * weight) // sum(weight) OVER () AS base,
    (CAST($total AS HUGEINT) * weight) % sum(weight) OVER () AS rem
  FROM w),
r AS (SELECT t.*, $total - sum(base) OVER () AS extra,
    row_number() OVER (ORDER BY rem DESC, $groupCol ASC NULLS FIRST) AS rk
  FROM t)
SELECT $groupCol, CAST(weight AS BIGINT) AS weight,
  CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM r ORDER BY $groupCol"""
}
