package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Gini concentration coefficient — the rank-based inequality
  * measure beside [[Profiling.keyConcentration]]'s HHI: how unequally is
  * revenue spread over customers, tokens over domains, events over
  * users? (G = 0 everyone equal, → 1 one entity holds everything; the
  * corpus-mixing and whale-risk readout in one number.)
  *
  * Sample formula over ascending-sorted non-negative values x_1..x_n:
  *
  *   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
  *
  * quantized to `⌊SCALE·…⌋` with every moment an exact DECIMAL(38,0)
  * integer and ONE truncating division on non-negative operands (the
  * numerator is ≥ 0 for the ascending order, so truncation and floor
  * coincide on both engines). Ties order by `idCol` — a total order, so
  * the rank moment (and therefore G) is deterministic and replayable.
  *
  * Scale shape: ranking is the [[QuantileBuckets.ntileExact]] machinery
  * (range exchange + per-partition dense index — no global window); the
  * moments are one partial-agg'd grand aggregate of three decimals.
  */
object Gini {

  val Scale = 1000000L

  /** One row: (n, total, gini_scaled). Rows with NULL value/id drop;
    * values must be non-negative (caller contract — Gini is defined on
    * non-negatives, and the truncation-equals-floor argument needs it);
    * `gini_scaled` is NULL when n = 0 or total = 0.
    */
  def gini(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val in = df.where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol), col(valueCol).cast("long").as("__v"))
    val sorted = in.repartitionByRange(col("__v"), col(idCol))
      .sortWithinPartitions("__v", idCol)
    // pinned: range-exchange layouts are not replay-deterministic (see
    // DenseIndex.withDenseIndexPinned)
    val ranked = graft.core.DenseIndex.withDenseIndexPinned(sorted, "__rank0")
    ranked
      .select(col("__v"),
        (col("__rank0") + 1).cast(dec).as("__rk"),
        col("__v").cast(dec).as("__vd"))
      .agg(count(lit(1)).as("n"),
        sum(col("__vd")).cast(dec).as("__t"),
        sum((col("__rk") * col("__vd")).cast(dec)).cast(dec).as("__st"))
      .select(col("n"),
        coalesce(col("__t"), lit(0).cast(dec)).cast("long").as("total"),
        when(col("n") === 0 || col("__t").isNull || col("__t") === lit(0).cast(dec),
          lit(null).cast("long"))
          .otherwise(expr(
            s"CAST(((2 * __st - (n + 1) * __t) * $Scale) div " +
              "CAST((CAST(n AS DECIMAL(38,0)) * __t) AS DECIMAL(38,0)) AS BIGINT)"))
          .as("gini_scaled"))
  }

  /** DuckDB replay — same (value, id) total order, HUGEINT moments, same
    * truncating division.
    */
  def giniOracle(table: String, valueSql: String, idCol: String): String =
    s"""WITH r AS (SELECT CAST($valueSql AS BIGINT) AS v,
  row_number() OVER (ORDER BY CAST($valueSql AS BIGINT), $idCol) AS rk
  FROM $table WHERE ($valueSql) IS NOT NULL AND $idCol IS NOT NULL),
s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(CAST(v AS HUGEINT)) AS t,
  sum(CAST(rk AS HUGEINT) * CAST(v AS HUGEINT)) AS st FROM r)
SELECT n, CAST(coalesce(t, 0) AS BIGINT) AS total,
  CASE WHEN n = 0 OR t = 0 THEN NULL
       ELSE CAST(((2 * st - (n + 1) * t) * $Scale) // (n * t) AS BIGINT)
  END AS gini_scaled
FROM s""".stripMargin
}
