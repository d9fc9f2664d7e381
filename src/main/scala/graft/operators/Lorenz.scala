package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lorenz curve points — the CURVE behind [[Gini.gini]]'s one number:
  * after sorting entities ascending by value, what share of the total do
  * the bottom 10%, 20%, … hold? The concentration readout reviews
  * actually look at ("the bottom half of customers carries 4% of
  * revenue; the top decile 61%") and the audit for corpus mixing,
  * revenue dependency, and whale risk, with k points instead of one
  * coefficient.
  *
  * Exact semantics: entities order ascending by (value, id) — the
  * [[Gini]] total-order tiebreak — and split into k NTILE-exact buckets
  * ([[QuantileBuckets.ntileExact]]'s pure-integer size rule); per bucket
  * the value sum, cumulative sums over the k-sized bucket axis, and the
  * two published shares are per-bucket single truncating divisions
  * `share_q6 = ⌊10⁶·cumValue/total⌋`, `pop_q6 = ⌊10⁶·cumN/n⌋` on
  * non-negative operands (the non-negative-values caller contract from
  * [[Gini]]). The last bucket provably closes at exactly 10⁶/10⁶.
  *
  * Scale shape: ranking is the range-exchange + per-partition dense
  * index (no global window); bucket collapse is one partial-agg'd
  * k-row aggregate; the cumulation windows over the K-SIZED bucket
  * axis. NULL value/id rows drop.
  */
object Lorenz {

  val Scale = 1000000L

  /** k rows: (bucket, n, cum_n, cum_value, pop_q6, share_q6). NULL
    * shares when the total is 0.
    */
  def curve(df: DataFrame, valueCol: String, idCol: String,
            k: Int = 10): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    graft.Guards.requireIntegral(df, valueCol, "lorenz")
    val dec = "decimal(38,0)"
    val in = df.where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol), col(valueCol).cast("long").as("__v"))
    val bucketed = QuantileBuckets.ntileExact(in, "__v", idCol, k)
    val perBucket = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), graft.ExactSum.sumLong(col("__v")).as("__s"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perBucket
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("__cv", sum(col("__s")).over(w).cast(dec))
      .withColumn("__tn", sum(col("n")).over(tot))
      .withColumn("__tv", sum(col("__s")).over(tot).cast(dec))
      .select(col("bucket"), col("n"), col("cum_n"),
        col("__cv").cast("long").as("cum_value"),
        call_function("div",
          (lit(Scale) * col("cum_n")).cast(dec), col("__tn").cast(dec))
          .cast("long").as("pop_q6"),
        when(col("__tv") === lit(0).cast(dec), lit(null).cast("long"))
          .otherwise(call_function("div",
            (lit(Scale).cast(dec) * col("__cv")).cast(dec), col("__tv"))
            .cast("long")).as("share_q6"))
  }

  /** DuckDB replay — window NTILE (provably equal to the distributed
    * bucket rule), HUGEINT cumulations, same divisions. `valueSql` must
    * be non-NULL-filtered by the WHERE here.
    */
  def oracleSql(table: String, valueSql: String, idCol: String,
                k: Int = 10): String =
    s"""WITH r AS (SELECT CAST($valueSql AS BIGINT) AS v,
  ntile($k) OVER (ORDER BY CAST($valueSql AS BIGINT) ASC NULLS FIRST, $idCol) AS bucket
  FROM $table WHERE ($valueSql) IS NOT NULL AND $idCol IS NOT NULL),
b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(v AS HUGEINT)) AS s FROM r GROUP BY bucket),
c AS (SELECT bucket, n,
    sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
    sum(s) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cv,
    sum(n) OVER () AS tn, sum(s) OVER () AS tv
  FROM b)
SELECT bucket, n, CAST(cum_n AS BIGINT) AS cum_n,
  CAST(cv AS BIGINT) AS cum_value,
  CAST(($Scale * cum_n) // tn AS BIGINT) AS pop_q6,
  CASE WHEN tv = 0 THEN NULL
       ELSE CAST(($Scale * cv) // tv AS BIGINT) END AS share_q6
FROM c ORDER BY bucket"""
}
