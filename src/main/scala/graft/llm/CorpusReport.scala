package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus data card — the summary table every dataset release
  * ships (docs, token mass, language spread, exact-duplicate rate, size
  * shape), melted to a stable (metric, value) schema so downstream
  * tooling (and the [[graft.operators.SnapshotDiff]] / drift monitors)
  * can diff cards across corpus versions without schema churn.
  *
  * Cost: ONE corpus scan — every metric is an aggregate of the same
  * pass (the two exact distincts ride Spark's Expand-based multi-distinct
  * rewrite: rows collapse map-side per distinct key, so the exchanges
  * carry fingerprints/langs, not documents). Values are exact integers
  * (token counts, md5-60 fingerprint distincts, milli-quantized mean),
  * so the card hashes cross-engine.
  */
object CorpusReport {

  /** (metric, value) rows: n_docs, total_tokens, mean_tokens_milli
    * (⌊1000·total/docs⌋), n_langs, n_distinct_texts (by 60-bit
    * fingerprint), n_exact_dup_rows (non-NULL-text docs − distincts — a
    * NULL text is MISSING, not a duplicate of anything, so it joins
    * neither side of the dup ratio). NULL text counts as zero tokens.
    */
  def dataCard(docs: DataFrame, textCol: String = "text",
               langCol: String = "lang"): DataFrame = {
    import graft.text.TextFunctions.{fingerprint, nTokens}
    val t = when(col(textCol).isNotNull, nTokens(col(textCol)).cast("long"))
      .otherwise(lit(0L))
    val one = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(t), lit(0L)).as("total_tokens"),
      coalesce(sum(when(col(textCol).isNotNull, 1L)), lit(0L)).as("n_texts"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(when(col(textCol).isNotNull, fingerprint(col(textCol))))
        .as("n_distinct_texts"))
    one.select(expr(
      """stack(6,
        |  'n_docs', n_docs,
        |  'total_tokens', total_tokens,
        |  'mean_tokens_milli',
        |    CASE WHEN n_docs = 0 THEN 0L
        |         ELSE CAST(total_tokens * 1000 div n_docs AS BIGINT) END,
        |  'n_langs', n_langs,
        |  'n_distinct_texts', n_distinct_texts,
        |  'n_exact_dup_rows', n_texts - n_distinct_texts
        |) AS (metric, value)""".stripMargin))
  }

  /** DuckDB replay of [[dataCard]] — scalar aggregates unioned in the
    * same metric order.
    */
  def dataCardOracle(table: String, textCol: String = "text",
                     langCol: String = "lang"): String = {
    val tok = s"CASE WHEN $textCol IS NULL THEN 0 ELSE len(string_split($textCol, ' ')) END"
    val fp = s"CAST(('0x'||substr(md5($textCol),1,15)) AS BIGINT)"
    s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum($tok), 0) AS BIGINT) AS total_tokens,
       |  CAST(coalesce(count(*) FILTER (WHERE $textCol IS NOT NULL), 0) AS BIGINT)
       |    AS n_texts,
       |  CAST(count(DISTINCT $langCol) AS BIGINT) AS n_langs,
       |  CAST(count(DISTINCT CASE WHEN $textCol IS NOT NULL THEN $fp END) AS BIGINT)
       |    AS n_distinct_texts
       |  FROM $table)
       |SELECT 'n_docs' AS metric, n_docs AS value FROM a
       |UNION ALL SELECT 'total_tokens', total_tokens FROM a
       |UNION ALL SELECT 'mean_tokens_milli',
       |  CASE WHEN n_docs = 0 THEN 0 ELSE total_tokens * 1000 // n_docs END FROM a
       |UNION ALL SELECT 'n_langs', n_langs FROM a
       |UNION ALL SELECT 'n_distinct_texts', n_distinct_texts FROM a
       |UNION ALL SELECT 'n_exact_dup_rows', n_texts - n_distinct_texts FROM a
       |ORDER BY metric""".stripMargin
  }
}
