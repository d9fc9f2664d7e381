package graft.text

import graft.operators.GroupedTrend
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf rank–frequency slope — the corpus-health scalar: natural text
  * follows freq ∝ rank^s with s ≈ −1, and a corpus (or one source/
  * language slice) that bends far off it is telling you something —
  * template/machine spam flattens the head (s → 0 among repeated
  * boilerplate), truncated or over-deduped corpora steepen the tail.
  * [[VocabDrift]] compares two corpora's vocabularies; this scores ONE
  * corpus against the law itself.
  *
  * Per group: token frequencies, deterministic rank (freq DESC, token
  * ASC — ties must not make "top N" ambiguous), the top `topN` vocab
  * rows, then the exact-integer OLS of ⌊10⁶·ln freq⌋ on ⌊10⁶·ln rank⌋
  * — per-term quantized-ln (one double chain per term, never a
  * cross-row float sum) feeding [[GroupedTrend.slope]]'s
  * DECIMAL(38,0) moment machinery, so the published `slope_q` (10⁻⁴
  * units; Zipf ⇒ ≈ −10000) is ONE sign-split division of exact
  * integers and both the ln floors and the division replay in DuckDB.
  *
  * Scale shape: the token count is one partial-agg'd (group, token)
  * groupBy (a 10⁹-occurrence stopword is one hot counter absorbed
  * map-side); the rank window runs over each group's VOCABULARY (the
  * healthy side of the rank posture — vocabularies are bounded, raw
  * corpora are not); the OLS is GroupedTrend's one-shuffle
  * five-partial aggregate over ≤ topN rows per group. NULL group/text
  * rows drop; a single-distinct-rank group (vocab of 1) reports NULL.
  */
object ZipfLaw {

  val LnScale = 1000000L

  /** (groupCol, n, slope_q) — n the vocab rows regressed (≤ topN). */
  def rankFrequencySlope(df: DataFrame, groupCol: String, textCol: String,
                         topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val counts = df
      .where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__freq"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__freq").desc, col("__tok").asc)
    val pairs = counts
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= topN)
      .select(col(groupCol),
        floor(lit(LnScale.toDouble) * log(col("__rk").cast("double")))
          .cast("long").as("__lnr"),
        floor(lit(LnScale.toDouble) * log(col("__freq").cast("double")))
          .cast("long").as("__lnf"))
    GroupedTrend.slope(pairs, Seq(groupCol), "__lnr", "__lnf")
  }

  /** DuckDB replay of [[rankFrequencySlope]] — same split/rank/floor
    * chain feeding [[GroupedTrend.oracleSql]].
    */
  def oracleSql(table: String, groupSql: String, groupName: String,
                textSql: String, topN: Int = 1000): String = {
    val pairs = s"""(WITH cnt AS (
  SELECT $groupSql AS $groupName, unnest(string_split($textSql, ' ')) AS tok
  FROM $table
  WHERE ($groupSql) IS NOT NULL AND ($textSql) IS NOT NULL),
fq AS (SELECT $groupName, tok, count(*) AS freq FROM cnt GROUP BY 1, 2),
rk AS (SELECT $groupName, freq,
    row_number() OVER (PARTITION BY $groupName
      ORDER BY freq DESC, tok ASC) AS r
  FROM fq)
SELECT $groupName,
  CAST(floor($LnScale.0 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS lnr,
  CAST(floor($LnScale.0 * ln(CAST(freq AS DOUBLE))) AS BIGINT) AS lnf
FROM rk WHERE r <= $topN)"""
    GroupedTrend.oracleSql(pairs, Seq(groupName), "lnr", "lnf") +
      s" ORDER BY $groupName"
  }
}
