package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** McNemar's test on paired binary outcomes — THE model-comparison test
  * for "did classifier B actually beat classifier A on the same
  * examples": accuracy deltas mislead when both models succeed on the
  * same easy mass; McNemar looks only at the DISCORDANT pairs (b10 =
  * A right, B wrong; b01 = A wrong, B right) and asks whether their
  * split is compatible with a coin flip — χ² = (b10 − b01)²/(b10 + b01).
  * The per-group form is the eval-harness readout: one row per slice
  * (language, difficulty bucket, source) with the discordant counts and
  * the exact statistic.
  *
  * Entirely exact: counts are integers, the statistic one non-negative
  * q6 floor division (numerator ≤ n², DECIMAL(38,0) far beyond any
  * eval-set size). No discordant pairs → NULL (the test is undefined,
  * not zero — identical models are a finding the counts already state).
  * The classical continuity correction is NOT applied (declared — the
  * uncorrected statistic is the one exact in integers; callers at tiny
  * discordant counts should read b10/b01 as a binomial directly).
  *
  * Contracts: outcomes must be 0/1 (raise in-plan — a score is a
  * different operator); NULL outcome rows drop; NULL groups are a real
  * stratum. One partial-agg'd pass, group-sized output.
  */
object McNemar {

  val Scale = 1000000L

  /** One row per group: (groupCol, n_pairs, b10, b01, chi2_q6). */
  def test(df: DataFrame, groupCol: String, aCol: String,
           bCol: String): DataFrame = {
    Seq(aCol, bCol).foreach(c => graft.Guards.requireIntegral(df, c, "mcnemar"))
    def bit(c: String) =
      when(!col(c).cast("long").isin(0L, 1L), raise_error(concat(
        lit(s"mcnemar: $c must be 0 or 1, got "), col(c).cast("string")))
        .cast("long"))
        .otherwise(col(c).cast("long"))
    val dec = "decimal(38,0)"
    df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol), bit(aCol).as("__a"), bit(bCol).as("__b"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__a") === 1L && col("__b") === 0L, 1L).otherwise(0L))
          .as("b10"),
        sum(when(col("__a") === 0L && col("__b") === 1L, 1L).otherwise(0L))
          .as("b01"))
      .withColumn("chi2_q6",
        when(col("b10") + col("b01") > 0L,
          call_function("div",
            (col("b10").cast(dec) - col("b01")) *
              (col("b10").cast(dec) - col("b01")) * Scale,
            (col("b10") + col("b01")).cast(dec)).cast("long")))
  }

  /** DuckDB replay of [[test]]; `pairsSql` yields (grp, a, b). */
  def oracleSql(pairsSql: String, groupName: String): String =
    s"""SELECT grp AS $groupName, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS b10,
  CAST(count(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS b01,
  CASE WHEN count(*) FILTER (WHERE a <> b) > 0 THEN CAST(
    (CAST(count(*) FILTER (WHERE a = 1 AND b = 0) AS HUGEINT)
      - count(*) FILTER (WHERE a = 0 AND b = 1))
    * (CAST(count(*) FILTER (WHERE a = 1 AND b = 0) AS HUGEINT)
      - count(*) FILTER (WHERE a = 0 AND b = 1)) * $Scale
    // (count(*) FILTER (WHERE a = 1 AND b = 0)
       + count(*) FILTER (WHERE a = 0 AND b = 1)) AS BIGINT) END AS chi2_q6
FROM ($pairsSql) WHERE a IS NOT NULL AND b IS NOT NULL
GROUP BY grp ORDER BY $groupName"""
}
