package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-cohort log-rank test components — "do arms A and B have the same
  * survival curve": the inference companion of [[Churn.kmSurvival]]
  * (that one DRAWS each curve; this scores the difference, the readout
  * an experiment on retention/time-to-failure actually ships). Input is
  * the classical per-subject form (arm, duration, event 0/1 — censored
  * subjects carry their observation time with event = 0).
  *
  * At each distinct event time t: d the deaths, r the at-risk total,
  * r_a the at-risk in A. The statistic's parts are published exactly:
  *
  *   o_a        = Σ d_a                       (exact integer)
  *   e_a_q6     = Σ ⌊10⁶·d·r_a/r⌋            (per-term floored)
  *   var_q6     = Σ ⌊10⁶·d·r_a·r_b·(r−d) / (r²·(r−1))⌋, r>1 terms
  *
  * so χ² = (o_a − e_a)²/var is one caller-side division away and both
  * sums replay bit-for-bit (per-term floors are DECLARED semantics,
  * the L259 device; each term biases < 1 micro-unit). At-risk counts
  * come from ONE reversed running sum over the distinct-duration axis
  * — never a subjects × ages inequality join. Magnitude bound:
  * r⁴·10⁶ must fit DECIMAL(38) ⇒ r ≤ ~4·10⁷ subjects per comparison
  * (ANSI throws loudly past it; pre-aggregate or subsample beyond).
  *
  * Contracts: events must be 0/1 (in-plan raise); rows with NULL
  * arm/duration/event drop; arms other than the two named drop
  * (deliberately — run pairwise comparisons over a many-arm column).
  */
object LogRank {

  val Scale = 1000000L

  /** One row: (n_a, n_b, o_a, o_b, e_a_q6, var_q6, n_event_times). */
  def logRank(df: DataFrame, armCol: String, durCol: String,
              eventCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, s"arms must differ, got '$armA' twice")
    graft.Guards.requireIntegral(df, durCol, "logRank")
    graft.Guards.requireIntegral(df, eventCol, "logRank")
    val dec = "decimal(38,0)"
    val ev = col(eventCol).cast(LongType)
    val guardedEv = when(ev === 0L || ev === 1L, ev)
      .otherwise(raise_error(concat(
        lit("logRank: event flag must be 0/1, got "), ev.cast("string"))))
    val subjects = df
      .where(col(armCol).isNotNull && col(durCol).isNotNull &&
        col(eventCol).isNotNull &&
        col(armCol).isin(armA, armB))
      .select((col(armCol) === armA).as("__isA"),
        col(durCol).cast(LongType).as("__dur"), guardedEv.as("__ev"))
    val byDur = subjects.groupBy(col("__dur")).agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("__c_a"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("__c_b"),
      sum(when(col("__isA"), col("__ev")).otherwise(0L)).as("__d_a"),
      sum(when(!col("__isA"), col("__ev")).otherwise(0L)).as("__d_b"))
    val tail = Window.orderBy(col("__dur").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val atRisk = byDur
      .withColumn("__r_a", sum(col("__c_a")).over(tail))
      .withColumn("__r_b", sum(col("__c_b")).over(tail))
      .where(col("__d_a") + col("__d_b") > 0L)
    val d = (col("__d_a") + col("__d_b")).cast(dec)
    val rA = col("__r_a").cast(dec); val rB = col("__r_b").cast(dec)
    val r = rA + rB
    val eTerm = call_function("div", d * rA * lit(Scale), r)
    val vTerm = when(r > 1,
      call_function("div",
        d * rA * rB * (r - d) * lit(Scale), r * r * (r - lit(1))))
      .otherwise(lit(0L))
    val terms = atRisk.agg(
      coalesce(sum(col("__d_a")), lit(0L)).as("o_a"),
      coalesce(sum(col("__d_b")), lit(0L)).as("o_b"),
      coalesce(sum(eTerm), lit(0L)).cast("long").as("e_a_q6"),
      coalesce(sum(vTerm), lit(0L)).cast("long").as("var_q6"),
      count(lit(1)).as("n_event_times"))
    val sizes = subjects.agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("n_b"))
    sizes.crossJoin(terms)
      .select(col("n_a"), col("n_b"), col("o_a"), col("o_b"),
        col("e_a_q6"), col("var_q6"), col("n_event_times"))
  }

  /** DuckDB replay of [[logRank]] — HUGEINT magnitudes, same per-term
    * floors; `subjectsSql` must yield (arm, dur, ev).
    */
  def oracleSql(subjectsSql: String, armA: String, armB: String): String =
    s"""WITH s AS (
  SELECT arm = '$armA' AS isa, CAST(dur AS BIGINT) AS dur,
    CAST(ev AS BIGINT) AS ev
  FROM ($subjectsSql)
  WHERE arm IS NOT NULL AND dur IS NOT NULL AND ev IS NOT NULL
    AND arm IN ('$armA', '$armB')),
bd AS (
  SELECT dur,
    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb,
    CAST(sum(CASE WHEN isa THEN ev ELSE 0 END) AS BIGINT) AS da,
    CAST(sum(CASE WHEN isa THEN 0 ELSE ev END) AS BIGINT) AS db
  FROM s GROUP BY dur),
ar AS (
  SELECT bd.*,
    CAST(sum(ca) OVER win AS HUGEINT) AS ra,
    CAST(sum(cb) OVER win AS HUGEINT) AS rb
  FROM bd
  WINDOW win AS (ORDER BY dur ASC
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
ev AS (SELECT * FROM ar WHERE da + db > 0),
t AS (
  SELECT
    CAST(coalesce(sum(da), 0) AS BIGINT) AS o_a,
    CAST(coalesce(sum(db), 0) AS BIGINT) AS o_b,
    CAST(coalesce(sum((CAST(da + db AS HUGEINT) * ra * $Scale)
      // (ra + rb)), 0) AS BIGINT) AS e_a_q6,
    CAST(coalesce(sum(CASE WHEN ra + rb > 1 THEN
      (CAST(da + db AS HUGEINT) * ra * rb * (ra + rb - da - db) * $Scale)
        // ((ra + rb) * (ra + rb) * (ra + rb - 1)) ELSE 0 END), 0)
      AS BIGINT) AS var_q6,
    CAST(count(*) AS BIGINT) AS n_event_times
  FROM ev),
sz AS (
  SELECT CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM s)
SELECT n_a, n_b, o_a, o_b, e_a_q6, var_q6, n_event_times FROM sz, t"""
}
