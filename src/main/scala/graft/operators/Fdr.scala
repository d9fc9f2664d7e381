package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Benjamini–Hochberg FDR control — the multiple-testing layer over
  * any fleet of per-key tests (thousands of metrics monitored daily,
  * per-segment A/B readouts, per-feature drift screens: at α = 0.05 a
  * thousand TRUE nulls yield ~50 raw "significant" hits; BH caps the
  * expected FALSE-discovery fraction instead). Inputs are p-values
  * already quantized to 10⁻⁶ (the repo's experimentation ops publish
  * integer readouts; anything float quantizes upstream), so every
  * decision is exact integer arithmetic:
  *
  *   - rank i by p ascending (id tiebreak);
  *   - step-up: k* = max{i : pᵢ·m·αden ≤ i·αnum·10⁶} (one
  *     cross-multiplied compare per row — never a float threshold),
  *     reject ⇔ rank ≤ k*;
  *   - q-values: qᵢ = min(10⁶, min_{j≥i} ⌊pⱼ·m/j⌋) — per-term floored
  *     (declared semantics), one reversed running min.
  *
  * p-values outside [0, 10⁶] raise loudly inside the plan; NULL
  * p-values drop; NULL groups are a real stratum. Scale shape: each
  * group (a metric family, an experiment) sorts once in one task — the
  * rank posture; m·10⁶·αden stays under a long for m ≤ ~10¹¹.
  */
object Fdr {

  val Scale = 1000000L

  /** (groupCol, idCol, p_q6, rk, reject, q_q6). */
  def bhDecisions(df: DataFrame, groupCol: String, idCol: String,
                  pCol: String, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha = $alphaNum/$alphaDen must lie in (0, 1)")
    graft.Guards.requireIntegral(df, pCol, "bhDecisions")
    val rows = df
      .where(col(pCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), col(idCol),
        col(pCol).cast(LongType).as("p_q6"))
    val part = Window.partitionBy(col(groupCol))
    val ord = part.orderBy(col("p_q6").asc, col(idCol).asc)
    val tail = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val full = part.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val guardedP = when(col("p_q6") < 0L || col("p_q6") > Scale,
      raise_error(concat(lit("bhDecisions: p_q6 = "),
        col("p_q6").cast("string"),
        lit(s" outside [0, $Scale] — p-values quantize to 1e-6 units"))))
      .otherwise(col("p_q6"))
    rows
      .withColumn("__m", count(lit(1)).over(part))
      .withColumn("rk", row_number().over(ord).cast(LongType))
      .withColumn("__pass",
        when(guardedP * col("__m") * lit(alphaDen) <=
          col("rk") * lit(alphaNum) * lit(Scale), col("rk")))
      .withColumn("__kstar",
        coalesce(max(col("__pass")).over(full), lit(0L)))
      // q terms (and the p_q6 passthrough) derive from the GUARDED
      // value, so no projection of the output can prune the range raise
      .withColumn("__term",
        call_function("div", guardedP * col("__m"), col("rk")))
      .withColumn("q_q6",
        least(lit(Scale), min(col("__term")).over(tail)))
      .select(col(groupCol), col(idCol), guardedP.as("p_q6"), col("rk"),
        (col("rk") <= col("__kstar")).as("reject"), col("q_q6"))
  }

  /** Holm step-down FWER control — the stricter sibling of
    * [[bhDecisions]] for when ANY false positive is unacceptable (a
    * launch/no-launch gate, a safety alarm) rather than a tolerable
    * fraction: uniformly more powerful than plain Bonferroni at the
    * same family-wise guarantee and assumption-free. Same integer
    * discipline on 10⁻⁶-quantized p-values:
    *
    *   - rank i by p ascending (id tiebreak);
    *   - step-down: reject rank i ⇔ every j ≤ i passes its own bar,
    *     i.e. running-max_{j≤i} (m−j+1)·pⱼ·αden ≤ αnum·10⁶ (one
    *     cross-multiplied compare, monotone by construction);
    *   - adjusted p: adjᵢ = min(10⁶, running-max_{j≤i} (m−j+1)·pⱼ).
    *
    * Same contracts as BH (range raise in-plan, NULL p drops, NULL
    * groups are strata, one ranked window per group).
    */
  def holmDecisions(df: DataFrame, groupCol: String, idCol: String,
                    pCol: String, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha = $alphaNum/$alphaDen must lie in (0, 1)")
    graft.Guards.requireIntegral(df, pCol, "holmDecisions")
    val rows = df
      .where(col(pCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol), col(idCol),
        col(pCol).cast(LongType).as("p_q6"))
    val part = Window.partitionBy(col(groupCol))
    val ord = part.orderBy(col("p_q6").asc, col(idCol).asc)
    val head = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val guardedP = when(col("p_q6") < 0L || col("p_q6") > Scale,
      raise_error(concat(lit("holmDecisions: p_q6 = "),
        col("p_q6").cast("string"),
        lit(s" outside [0, $Scale] — p-values quantize to 1e-6 units"))))
      .otherwise(col("p_q6"))
    rows
      .withColumn("__m", count(lit(1)).over(part))
      .withColumn("rk", row_number().over(ord).cast(LongType))
      .withColumn("__term", (col("__m") - col("rk") + 1L) * guardedP)
      .withColumn("__runMax", max(col("__term")).over(head))
      .select(col(groupCol), col(idCol), guardedP.as("p_q6"), col("rk"),
        (col("__runMax") * lit(alphaDen) <= lit(alphaNum) * lit(Scale))
          .as("reject"),
        least(lit(Scale), col("__runMax")).as("adj_q6"))
  }

  /** DuckDB replay of [[holmDecisions]]. */
  def holmOracleSql(testsSql: String, groupName: String, idName: String,
                    alphaNum: Long, alphaDen: Long): String =
    s"""WITH r AS (
  SELECT grp, id, p FROM ($testsSql) WHERE p IS NOT NULL AND id IS NOT NULL),
w AS (
  SELECT grp, id, p,
    count(*) OVER (PARTITION BY grp) AS m,
    row_number() OVER (PARTITION BY grp ORDER BY p ASC, id ASC) AS rk
  FROM r),
x AS (
  SELECT grp, id, p, rk,
    max((m - rk + 1) * p) OVER (PARTITION BY grp ORDER BY p ASC, id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM w)
SELECT grp AS $groupName, id AS $idName, CAST(p AS BIGINT) AS p_q6,
  CAST(rk AS BIGINT) AS rk,
  runmax * $alphaDen <= $alphaNum * $Scale AS reject,
  CAST(least($Scale, runmax) AS BIGINT) AS adj_q6
FROM x ORDER BY $groupName, rk"""

  /** DuckDB replay of [[bhDecisions]] — same rank, cross-multiplied
    * step-up and reversed running min (ROWS frames explicit).
    */
  def oracleSql(testsSql: String, groupName: String, idName: String,
                alphaNum: Long, alphaDen: Long): String =
    s"""WITH b AS (
  SELECT $groupName, $idName, CAST(p AS BIGINT) AS p_q6
  FROM ($testsSql) WHERE p IS NOT NULL AND $idName IS NOT NULL),
r AS (
  SELECT $groupName, $idName, p_q6,
    CAST(count(*) OVER (PARTITION BY $groupName) AS BIGINT) AS m,
    CAST(row_number() OVER win AS BIGINT) AS rk
  FROM b
  WINDOW win AS (PARTITION BY $groupName ORDER BY p_q6 ASC, $idName ASC)),
k AS (
  SELECT r.*,
    coalesce(max(CASE WHEN p_q6 * m * $alphaDen <= rk * $alphaNum * $Scale
      THEN rk END) OVER (PARTITION BY $groupName), 0) AS kstar,
    least($Scale, min((p_q6 * m) // rk) OVER
      (PARTITION BY $groupName ORDER BY p_q6 ASC, $idName ASC
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS q
  FROM r)
SELECT $groupName, $idName, p_q6, rk, rk <= kstar AS reject,
  CAST(q AS BIGINT) AS q_q6
FROM k ORDER BY $groupName, rk"""
}
