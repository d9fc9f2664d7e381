package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mann–Kendall trend TEST — is there a monotone trend at all? The
  * hypothesis-test companion to [[TheilSen]]'s slope ESTIMATOR (the two
  * are the classical pairing: MK decides, Theil–Sen sizes): S =
  * Σ_{i<j} sgn(v_j − v_i) over the time order, with the tie-corrected
  * null variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 summed
  * over tied-value multiplicities t. Distribution-free, outlier-robust,
  * the standard trend screen for telemetry/hydrology/metric series.
  *
  * Exact decomposition, no pair join: disc (= time-ascending pairs with
  * the value DESCENDING) comes from one O(n log n) native merge-sort
  * inversion count over the collected series
  * ([[graft.functions.InversionCount]]); tied pairs and the variance's
  * tie term are per-value marginal sums; conc = n(n−1)/2 − disc − ties.
  * So S and the exact 18·Var(S) publish as plain BIGINTs (at the
  * guarded sizes both fit Long with orders of magnitude to spare; the
  * float z-score rides spec-side, the repo's √ convention).
  *
  * Calendar-series contract (the TheilSen discipline): groups above
  * `maxPoints` raise loudly in-plan BEFORE the collect can balloon an
  * aggregation buffer, duplicate time indexes raise (S must be a
  * function of the data, and a duplicated index has no defined order),
  * NULL idx/value rows drop, NULL groups are real strata. Scale shape:
  * one per-(group, idx) dup-probe window + one collect_list aggregate +
  * one per-(group, value) partial-agg'd marginal — whale groups are
  * impossible by guard, not by hope.
  */
object MannKendall {

  /** One row per group: (groupCol, n, s_stat, tie_pairs, var18) where
    * s_stat = conc − disc and var18 = 18·Var(S) exactly. Groups with
    * n < 2 publish s_stat 0 and var18 NULL (the test is undefined).
    */
  def trend(df: DataFrame, groupCol: String, idxCol: String,
            valueCol: String, maxPoints: Long = 20000L): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    graft.Guards.requireIntegral(df, idxCol, "mannKendall")
    graft.Guards.requireIntegral(df, valueCol, "mannKendall")
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast(LongType).as("__i"),
        col(valueCol).cast(LongType).as("__v"))
    val full = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perI = Window.partitionBy(col(groupCol), col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // both guards ride __i — the column the series sort consumes
    val guarded = rows
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__ni", count(lit(1)).over(perI))
      .withColumn("__i",
        when(col("__n") > maxPoints,
          raise_error(concat(lit("mannKendall: group '"),
            col(groupCol).cast("string"), lit("' carries "),
            col("__n").cast("string"),
            lit(" points — feed a bounded series (daily spine, " +
              "pre-aggregated), or raise maxPoints"))).cast("long"))
          .when(col("__ni") > 1L,
            raise_error(concat(lit("mannKendall: duplicate idx "),
              col("__i").cast("string"),
              lit(" within a group — the time order must be total")))
              .cast("long"))
          .otherwise(col("__i")))
      .select(col(groupCol), col("__i"), col("__v"))
    val series = guarded.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        graft.functions.InversionCount(
          transform(sort_array(collect_list(struct(col("__i"), col("__v")))),
            s => s.getField("__v"))).as("__disc"))
    // per-value marginals: tied pairs and the variance tie term
    val ties = guarded.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol).as("__tg"))
      .agg(
        sum(expr("__c * (__c - 1) div 2")).as("__tiePairs"),
        sum(expr("__c * (__c - 1) * (2 * __c + 5)")).as("__tieTerm"))
    val joined = series.join(ties, col(groupCol) <=> col("__tg"))
    val nPairs = expr("n * (n - 1) div 2")
    val conc = nPairs - col("__disc") - col("__tiePairs")
    joined.select(col(groupCol), col("n"),
      (conc - col("__disc")).as("s_stat"),
      col("__tiePairs").as("tie_pairs"),
      when(col("n") >= 2,
        expr("n * (n - 1) * (2 * n + 5)") - col("__tieTerm"))
        .as("var18"))
  }

  /** DuckDB replay — the naive O(n²) pair join (an oracle for bounded
    * gate series, not a production path) plus the same marginal sums.
    * `seriesSql` yields (grp, i, v).
    */
  def oracleSql(seriesSql: String, groupName: String): String =
    s"""WITH s AS (SELECT grp, i, v FROM ($seriesSql)
  WHERE i IS NOT NULL AND v IS NOT NULL),
pr AS (SELECT a.grp,
    CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END)
      AS BIGINT) AS s_stat
  FROM s a JOIN s b ON a.grp IS NOT DISTINCT FROM b.grp AND b.i > a.i
  GROUP BY a.grp),
cnt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY grp),
tt AS (SELECT grp,
    CAST(sum(c * (c - 1) // 2) AS BIGINT) AS tie_pairs,
    CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_term
  FROM (SELECT grp, v, count(*) AS c FROM s GROUP BY grp, v)
  GROUP BY grp)
SELECT cnt.grp AS $groupName, cnt.n,
  coalesce(pr.s_stat, 0) AS s_stat, tt.tie_pairs,
  CASE WHEN cnt.n >= 2
       THEN cnt.n * (cnt.n - 1) * (2 * cnt.n + 5) - tt.tie_term
  END AS var18
FROM cnt
LEFT JOIN pr ON pr.grp IS NOT DISTINCT FROM cnt.grp
JOIN tt ON tt.grp IS NOT DISTINCT FROM cnt.grp
ORDER BY cnt.grp"""
}
