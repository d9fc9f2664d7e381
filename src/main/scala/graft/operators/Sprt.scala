package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald's sequential probability ratio test (SPRT) — the experiment
  * readout that answers "could we have stopped early, and where": for a
  * Bernoulli stream per group, the cumulative log-likelihood ratio
  * between H1 (rate p1) and H0 (rate p0) walks up with each success and
  * down with each failure; the FIRST crossing of the Wald boundaries
  * ln((1−β)/α) / ln(β/(1−α)) decides. The fixed-horizon readouts live in
  * [[AbTest]]; SPRT is the sequential member — monitoring dashboards
  * that peek at every event need its boundaries, not a z-test's.
  *
  * Exact semantics: the four log constants are quantized ONCE on the
  * driver (`⌊10⁶·ln·⌋`, floor — DECLARED; computed in one place and
  * embedded as literals in BOTH engines' plans, so no runtime ln ever
  * runs) and the walk is pure integer arithmetic: LLR_t = k_t·w + (n_t −
  * k_t)·l with w > 0 > l for p1 > p0. Outcomes must be 0/1 (anything
  * else raises in-plan); duplicate indexes raise (crossing order must be
  * a function of the data). Decision: 'h1' / 'h0' at the first boundary
  * crossing (that sample index is `n_at_decision`), 'continue' with the
  * final LLR if the walk never crosses.
  *
  * Scale shape: one per-group ordered window (cumsum + dup probe share
  * it), one filtered first-crossing election (`min(struct(rn, …))`
  * partial-agg'd), one group collapse — the [[Drawdown]] posture;
  * calendar/experiment-bounded groups by contract.
  */
object Sprt {

  val Scale = 1000000L

  /** Quantized Wald constants for (p0, p1, α, β) — one definition both
    * engines embed.
    */
  final case class Consts(winQ6: Long, loseQ6: Long, upperQ6: Long, lowerQ6: Long)

  def consts(p0Num: Long, p0Den: Long, p1Num: Long, p1Den: Long,
             alphaBp: Long, betaBp: Long): Consts = {
    require(p0Num > 0 && p0Num < p0Den, s"p0 = $p0Num/$p0Den must lie in (0, 1)")
    require(p1Num > 0 && p1Num < p1Den, s"p1 = $p1Num/$p1Den must lie in (0, 1)")
    require(p1Num * p0Den != p0Num * p1Den, "p0 and p1 must differ")
    require(alphaBp > 0 && alphaBp < 10000, s"alphaBp must be in (0, 10000), got $alphaBp")
    require(betaBp > 0 && betaBp < 10000, s"betaBp must be in (0, 10000), got $betaBp")
    val p0 = p0Num.toDouble / p0Den; val p1 = p1Num.toDouble / p1Den
    val a = alphaBp / 10000.0; val b = betaBp / 10000.0
    Consts(
      winQ6 = math.floor(Scale * math.log(p1 / p0)).toLong,
      loseQ6 = math.floor(Scale * math.log((1 - p1) / (1 - p0))).toLong,
      upperQ6 = math.floor(Scale * math.log((1 - b) / a)).toLong,
      lowerQ6 = math.floor(Scale * math.log(b / (1 - a))).toLong)
  }

  /** One row per group: (groupCol, n, successes, decision, n_at_decision,
    * llr_q6) — `n_at_decision`/`llr_q6` at the first crossing, or the
    * final sample when the decision is 'continue'.
    */
  def bernoulli(df: DataFrame, groupCol: String, idxCol: String,
                outcomeCol: String,
                p0Num: Long, p0Den: Long, p1Num: Long, p1Den: Long,
                alphaBp: Long = 500L, betaBp: Long = 2000L): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "sprt")
    graft.Guards.requireIntegral(df, outcomeCol, "sprt")
    val c = consts(p0Num, p0Den, p1Num, p1Den, alphaBp, betaBp)
    val rows = df
      .where(col(idxCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(groupCol), col(idxCol).cast("long").as("__i"),
        when(col(outcomeCol).cast("long").isin(0L, 1L),
          col(outcomeCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("sprt: outcome must be 0/1, got "),
            col(outcomeCol).cast("string"), lit(" at idx "),
            col(idxCol).cast("string"))).cast("long")).as("__x"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__i"))
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val walked = rows
      .withColumn("__dup", lag(col("__i"), 1).over(w) === col("__i"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__k", sum(col("__x")).over(cum))
      .withColumn("__llr",
        col("__k") * lit(c.winQ6) + (col("__rn") - col("__k")) * lit(c.loseQ6))
      .withColumn("__cross",
        when(col("__llr") >= c.upperQ6, lit("h1"))
          .when(col("__llr") <= c.lowerQ6, lit("h0")))
    val agg = walked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("successes"),
        max(coalesce(col("__dup"), lit(false))).as("__anyDup"),
        min(when(col("__cross").isNotNull,
          struct(col("__rn"), col("__llr"), col("__cross")))).as("__first"),
        max(struct(col("__rn"), col("__llr"))).as("__last"))
    def guarded(out: org.apache.spark.sql.Column) =
      when(col("__anyDup"), raise_error(concat(
        lit("sprt: duplicate idx within group '"),
        col(groupCol).cast("string"),
        lit("' — the crossing order must be a function of the data")))
        .cast("string"))
        .otherwise(out.cast("string"))
    agg.select(col(groupCol), col("n"), col("successes"),
      guarded(coalesce(col("__first").getField("__cross"), lit("continue")))
        .as("decision"),
      guarded(coalesce(col("__first").getField("__rn"),
        col("__last").getField("__rn"))).cast("long").as("n_at_decision"),
      guarded(coalesce(col("__first").getField("__llr"),
        col("__last").getField("__llr"))).cast("long").as("llr_q6"))
  }

  /** DuckDB replay — the same literal constants (pass the SAME [[Consts]]
    * the Spark side used), same windows, two-level first-crossing.
    * `seriesSql` yields (grp, i, x).
    */
  def oracleSql(seriesSql: String, groupName: String, c: Consts): String =
    s"""WITH s AS (SELECT grp, i, x FROM ($seriesSql)
  WHERE i IS NOT NULL AND x IS NOT NULL),
wk AS (SELECT grp, i, x,
    row_number() OVER (PARTITION BY grp ORDER BY i) AS rn,
    sum(x) OVER (PARTITION BY grp ORDER BY i ROWS UNBOUNDED PRECEDING) AS k
  FROM s),
l AS (SELECT grp, rn,
    k * ${c.winQ6} + (rn - k) * ${c.loseQ6} AS llr,
    CASE WHEN k * ${c.winQ6} + (rn - k) * ${c.loseQ6} >= ${c.upperQ6} THEN 'h1'
         WHEN k * ${c.winQ6} + (rn - k) * ${c.loseQ6} <= ${c.lowerQ6} THEN 'h0'
    END AS cr
  FROM wk),
f AS (SELECT grp, min(rn) AS frn FROM l WHERE cr IS NOT NULL GROUP BY grp),
t AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
    max(rn) AS lrn FROM l GROUP BY grp),
sx AS (SELECT grp, CAST(sum(x) AS BIGINT) AS successes FROM s GROUP BY grp)
SELECT t.grp AS $groupName, t.n, sx.successes,
  coalesce(lf.cr, 'continue') AS decision,
  CAST(coalesce(f.frn, t.lrn) AS BIGINT) AS n_at_decision,
  CAST(lp.llr AS BIGINT) AS llr_q6
FROM t
JOIN sx ON sx.grp IS NOT DISTINCT FROM t.grp
LEFT JOIN f ON f.grp IS NOT DISTINCT FROM t.grp
JOIN l lp ON lp.grp IS NOT DISTINCT FROM t.grp
  AND lp.rn = coalesce(f.frn, t.lrn)
LEFT JOIN l lf ON lf.grp IS NOT DISTINCT FROM t.grp AND lf.rn = f.frn
ORDER BY $groupName"""
}
