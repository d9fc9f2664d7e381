package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Benford first-digit audit — the forensic data-quality screen: naturally
  * occurring multi-magnitude quantities (transaction amounts, populations,
  * file sizes) lead with digit d at probability log₁₀(1+1/d) ≈ 30.1% for
  * 1 down to 4.6% for 9, and FABRICATED or structurally-capped data
  * (made-up invoices, synthetic fills, truncated extracts) visibly
  * doesn't. Per (group, digit), the observed count faces the Benford
  * expectation and the deviation is the exact cross-multiplied integer
  * `|1000·n_obs − n·p_milli|` (scale 1000·n) — summable per group into a
  * total-variation-style audit number, no floats anywhere.
  *
  * The expected distribution ships as FIXED milli-probabilities
  * ([[ExpectedMilli]], summing to exactly 1000) so both engines compare
  * against identical integers. The first digit comes from the decimal
  * string of |value| — pure integer/string arithmetic, identical on any
  * engine. Zero and NULL values have no leading digit and drop.
  *
  * Scale shape: one partial-agg'd (group, digit) count, a group-sized
  * totals join, and a 9-row-per-group digit spine (missing digits appear
  * with n_obs = 0 — the [[DenseSeries]] zero-fill discipline: an absent
  * digit IS the signal in a capped dataset). Output is 9 × groups rows
  * whatever the input size.
  */
object Benford {

  /** ⌊1000·log₁₀(1+1/d)⌋-style fixed expectation, adjusted to sum to
    * exactly 1000: (301, 176, 125, 97, 79, 67, 58, 51, 46).
    */
  val ExpectedMilli: Seq[Long] = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
  require(ExpectedMilli.sum == 1000L)

  /** (groupCol, digit, n_obs, n_total, expected_milli, dev) per group ×
    * digit 1..9, dev = |1000·n_obs − n_total·expected_milli|.
    */
  def firstDigitAudit(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "firstDigitAudit")
    val obs = df
      .where(col(valueCol).isNotNull && col(valueCol) =!= 0 &&
        // Long.MinValue has no |value| (abs overflows under ANSI and its
        // decimal string leads with '-' otherwise) — the one long with no
        // first digit; drop it like the zero it behaves as
        col(valueCol) =!= Long.MinValue &&
        col(groupCol).isNotNull)
      .select(col(groupCol),
        substring(abs(col(valueCol).cast(LongType)).cast("string"), 1, 1)
          .cast(LongType).as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("__n"))
    val totals = obs.groupBy(col(groupCol)).agg(sum(col("__n")).as("n_total"))
    val expected = df.sparkSession.createDataFrame(
      ExpectedMilli.zipWithIndex.map { case (p, i) => (i + 1L, p) })
      .toDF("digit", "expected_milli")
    totals.crossJoin(expected)
      .join(obs, Seq(groupCol, "digit"), "left")
      .select(col(groupCol), col("digit"),
        coalesce(col("__n"), lit(0L)).as("n_obs"),
        col("n_total"), col("expected_milli"),
        abs(lit(1000L) * coalesce(col("__n"), lit(0L))
          - col("n_total") * col("expected_milli")).as("dev"))
  }

  /** DuckDB replay of [[firstDigitAudit]] — same fixed milli table, same
    * string-derived first digit, same zero-filled digit spine.
    */
  def oracleSql(table: String, groupCol: String, valueSql: String): String = {
    val expectedRows = ExpectedMilli.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
    s"""WITH obs AS (
  SELECT $groupCol, CAST(left(CAST(abs(CAST($valueSql AS BIGINT)) AS VARCHAR), 1) AS BIGINT) AS digit,
    count(*) AS n
  FROM $table
  WHERE ($valueSql) IS NOT NULL AND ($valueSql) <> 0
    AND ($valueSql) <> -9223372036854775808 AND $groupCol IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT $groupCol, CAST(sum(n) AS BIGINT) AS n_total FROM obs GROUP BY 1),
e(digit, expected_milli) AS (VALUES $expectedRows)
SELECT t.$groupCol, CAST(e.digit AS BIGINT) AS digit,
  CAST(coalesce(o.n, 0) AS BIGINT) AS n_obs, t.n_total,
  CAST(e.expected_milli AS BIGINT) AS expected_milli,
  abs(1000 * CAST(coalesce(o.n, 0) AS BIGINT)
    - t.n_total * e.expected_milli) AS dev
FROM t CROSS JOIN e
LEFT JOIN obs o ON o.$groupCol = t.$groupCol AND o.digit = e.digit
ORDER BY 1, 2""".stripMargin
  }
}
