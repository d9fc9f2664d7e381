package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-of-frequencies and the Good–Turing unseen-mass estimate —
  * "how much of this corpus' distribution have we NOT seen yet": the
  * f-of-f table (how many terms occur exactly r times) is the
  * Zipf-companion diagnostic ([[ZipfLaw]] reads the head's slope, this
  * reads the TAIL's shape), and its r = 1 row powers the classical
  * Good–Turing estimate p₀ = N₁/N of the probability mass sitting on
  * never-seen terms — the number that says whether a vocabulary,
  * dedup fingerprint set, or n-gram LM has converged (p₀ near 0) or is
  * still discovering (p₀ large), per language/source/slice.
  *
  * Entirely exact: counts are integers and p₀ is one non-negative q6
  * floor division N₁·10⁶ div N. Scale shape: one (group, term)
  * partial-agg'd collapse (the corpus-sized pass), one (group, count)
  * re-collapse (type-sized), one group-sized summary — the f-of-f table
  * is at most √N rows per group (Σ r·n_r = N bounds the distinct r's).
  * NULL terms drop; NULL groups are a real stratum.
  */
object GoodTuring {

  val Scale = 1000000L

  /** The f-of-f table: one row per (group, r): (groupCol, freq, n_terms). */
  def freqOfFreq(df: DataFrame, groupCol: String, termCol: String): DataFrame =
    df.where(col(termCol).isNotNull)
      .groupBy(col(groupCol), col(termCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol), col("__c").as("freq"))
      .agg(count(lit(1)).as("n_terms"))

  /** One row per group: (groupCol, n_tokens, n_types, singletons, p0_q6). */
  def unseenMass(df: DataFrame, groupCol: String, termCol: String): DataFrame =
    df.where(col(termCol).isNotNull)
      .groupBy(col(groupCol), col(termCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("singletons"))
      .withColumn("p0_q6",
        call_function("div", col("singletons") * Scale, col("n_tokens")))

  /** DuckDB replay of [[freqOfFreq]]; `termsSql` yields (grp, term). */
  def freqOfFreqOracle(termsSql: String, groupName: String): String =
    s"""SELECT grp AS $groupName, CAST(c AS BIGINT) AS freq,
  CAST(count(*) AS BIGINT) AS n_terms
FROM (SELECT grp, term, count(*) AS c FROM ($termsSql)
  WHERE term IS NOT NULL GROUP BY grp, term)
GROUP BY grp, c ORDER BY $groupName, freq"""

  /** DuckDB replay of [[unseenMass]]. */
  def unseenMassOracle(termsSql: String, groupName: String): String =
    s"""SELECT grp AS $groupName, CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_types,
  CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS singletons,
  CAST((count(*) FILTER (WHERE c = 1) * $Scale) // sum(c) AS BIGINT) AS p0_q6
FROM (SELECT grp, term, count(*) AS c FROM ($termsSql)
  WHERE term IS NOT NULL GROUP BY grp, term)
GROUP BY grp ORDER BY $groupName"""
}
