package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Murphy decomposition of the Brier score — Brier = REL − RES + UNC:
  * the readout that tells a model owner WHICH failure they have
  * (L147's calibration curve shows the shape; this scores it):
  * reliability = how far predicted probabilities sit from observed
  * rates (fixable by recalibration), resolution = how much the
  * forecasts actually separate outcomes (not fixable by remapping —
  * the model's real skill), uncertainty = the base rate's intrinsic
  * difficulty. A model can have a great Brier score and zero skill
  * (all-base-rate forecasts); the decomposition is how you see it.
  *
  * Probabilities arrive QUANTIZED (p_q ∈ [0, probScale] integers —
  * the repo's float-free contract; out-of-range raises) and buckets
  * are the EXACT distinct p_q values, which makes the decomposition
  * identity exact pre-quantization. Each component publishes through
  * a declared two-step ladder of sign-free truncating divisions:
  *
  *   brier_q6 = div(10⁶·Σ(p_i − y_i·S)², S²·n)            (one step)
  *   rel_q6   = div(Σ_k div(10⁶·(p_k·n_k − S·s_k)², S²·n_k), n)
  *   res_q6   = div(Σ_k div(10⁶·(s_k·n − s·n_k)², n_k·n²), n)
  *   unc_q6   = div(10⁶·s·(n−s), n²)
  *
  * (S = probScale; every numerator a perfect square, so sign-splitting
  * is moot). The identity survives quantization to within the summed
  * floor slack (spec-pinned ≤ 2 micro-units per bucket). Labels are
  * STRICT 0/1 (raise); NULL rows drop; NULL groups are real strata.
  * One partial-agg'd (group, p_q) collapse then bucket-sized algebra.
  */
object BrierDecomp {

  val Scale = 1000000L
  private val Dec = "decimal(38,0)"

  /** (groupCol, n, n_buckets, brier_q6, rel_q6, res_q6, unc_q6). */
  def decompose(df: DataFrame, groupCol: String, probCol: String,
                labelCol: String, probScale: Long = 1000L): DataFrame = {
    require(probScale >= 2, s"probScale must be >= 2, got $probScale")
    graft.Guards.requireIntegral(df, probCol, "brierDecompose")
    graft.Guards.requireIntegral(df, labelCol, "brierDecompose")
    val S = lit(probScale).cast(Dec)
    val p = when(col(probCol).cast("long").between(0L, probScale),
        col(probCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"brierDecompose: p_q must lie in [0, $probScale], got "),
        col(probCol).cast("string"))))
    val y = when(col(labelCol).cast("long").isin(0L, 1L),
        col(labelCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("brierDecompose: label must be 0/1, got "),
        col(labelCol).cast("string"))))
    val cells = df
      .where(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol), p.as("__p"), y.as("__y"))
      .groupBy(col(groupCol), col("__p"))
      .agg(count(lit(1)).as("__nk"), sum(col("__y")).as("__sk"),
        sum((col("__p").cast(Dec) - col("__y").cast(Dec) * S) *
          (col("__p").cast(Dec) - col("__y").cast(Dec) * S)).cast(Dec)
          .as("__sq"))
    val totals = cells.groupBy(col(groupCol).as("__tg"))
      .agg(sum(col("__nk")).as("__n"), sum(col("__sk")).as("__s"),
        count(lit(1)).as("__nb"), sum(col("__sq")).cast(Dec).as("__sqsum"))
    val j = cells.join(totals, col(groupCol) <=> col("__tg"))
    val nk = col("__nk").cast(Dec)
    val sk = col("__sk").cast(Dec)
    val n = col("__n").cast(Dec)
    val s = col("__s").cast(Dec)
    val q6 = lit(Scale).cast(Dec)
    val relNum = (col("__p").cast(Dec) * nk - S * sk) *
      (col("__p").cast(Dec) * nk - S * sk)
    val resNum = (sk * n - s * nk) * (sk * n - s * nk)
    val terms = j.groupBy(col(groupCol))
      .agg(min(col("__n")).as("n"), min(col("__nb")).as("n_buckets"),
        min(col("__s")).as("__s"), min(col("__sqsum")).as("__sqsum"),
        sum(call_function("div", q6 * relNum, S * S * nk)).as("__relSum"),
        sum(call_function("div", q6 * resNum, nk * n * n)).as("__resSum"))
    terms.select(col(groupCol), col("n"), col("n_buckets"),
      call_function("div", q6 * col("__sqsum").cast(Dec),
        S * S * col("n").cast(Dec)).as("brier_q6"),
      call_function("div", col("__relSum").cast(Dec), col("n").cast(Dec))
        .as("rel_q6"),
      call_function("div", col("__resSum").cast(Dec), col("n").cast(Dec))
        .as("res_q6"),
      call_function("div",
        q6 * col("__s").cast(Dec) *
          (col("n").cast(Dec) - col("__s").cast(Dec)),
        col("n").cast(Dec) * col("n").cast(Dec)).as("unc_q6"))
  }

  /** DuckDB replay; `rowsSql` yields (grp, p, y). */
  def oracleSql(rowsSql: String, groupName: String,
                probScale: Long = 1000L): String = {
    val S = probScale
    s"""WITH cells AS (SELECT grp, p, CAST(count(*) AS HUGEINT) AS nk,
    CAST(sum(y) AS HUGEINT) AS sk,
    sum(CAST(p - y * $S AS HUGEINT) * CAST(p - y * $S AS HUGEINT)) AS sq
  FROM ($rowsSql) WHERE p IS NOT NULL AND y IS NOT NULL GROUP BY grp, p),
tot AS (SELECT grp, sum(nk) AS n, sum(sk) AS s,
    CAST(count(*) AS HUGEINT) AS nb, sum(sq) AS sqsum
  FROM cells GROUP BY grp),
terms AS (SELECT c.grp,
    sum(($Scale * (c.p * c.nk - $S * c.sk) * (c.p * c.nk - $S * c.sk))
      // ($S * $S * c.nk)) AS rel_sum,
    sum(($Scale * (c.sk * t.n - t.s * c.nk) * (c.sk * t.n - t.s * c.nk))
      // (c.nk * t.n * t.n)) AS res_sum
  FROM cells c JOIN tot t ON c.grp IS NOT DISTINCT FROM t.grp
  GROUP BY c.grp)
SELECT t.grp AS $groupName, CAST(t.n AS BIGINT) AS n,
  CAST(t.nb AS BIGINT) AS n_buckets,
  CAST(($Scale * t.sqsum) // ($S * $S * t.n) AS BIGINT) AS brier_q6,
  CAST(terms.rel_sum // t.n AS BIGINT) AS rel_q6,
  CAST(terms.res_sum // t.n AS BIGINT) AS res_q6,
  CAST(($Scale * t.s * (t.n - t.s)) // (t.n * t.n) AS BIGINT) AS unc_q6
FROM tot t JOIN terms ON terms.grp IS NOT DISTINCT FROM t.grp
ORDER BY t.grp"""
  }
}
