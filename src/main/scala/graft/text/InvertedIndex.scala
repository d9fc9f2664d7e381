package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — term → (document frequency, bounded
  * posting list) over a tokenized corpus: the search/retrieval-side prep
  * step (BM25 serving, contamination lookups, keyword routing) that
  * complements the statistics-side TF-IDF family
  * ([[CorpusFilters]]).
  *
  * Scale shape: per-document DISTINCT terms come from `array_distinct`
  * in the scan stage (no shuffle-wide distinct), so the one shuffle keys
  * (term) with exact document frequency from a plain count. Posting
  * lists are BOUNDED: the k smallest doc ids per term ride
  * [[graft.functions.BottomK]]'s bounded-buffer aggregator (≤ k entries
  * per (term, partition), map-side partial merge) — a stopword term with
  * 10⁹ postings costs the same buffer as a rare one, the same whale-key
  * discipline as L66's action sequences; `df` still counts ALL postings
  * (the truncation is visible, not silent). Doc ids ascending keeps the
  * list deterministic and delta-encodable downstream.
  *
  * Reference scope note: no retrieval operators in fabrix — extension
  * surface beside the text-analysis family.
  */
object InvertedIndex {

  /** (term, df, postings[≤ maxPostings] ascending doc id). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        graft.functions.BottomK(maxPostings)(col("doc_id")).as("postings"))
  }

  /** Relational (gate-friendly) form: one row per posting,
    * (term, df, pos, doc_id) with pos 1-based in ascending doc order.
    */
  def buildFlat(docs: DataFrame, idCol: String, textCol: String,
                maxPostings: Int): DataFrame =
    build(docs, idCol, textCol, maxPostings)
      .select(col("term"), col("df"), posexplode(col("postings")).as(Seq("p", "doc_id")))
      .select(col("term"), col("df"), (col("p") + 1).cast("long").as("pos"), col("doc_id"))

  /** DuckDB replay of [[buildFlat]] — row_number over the same distinct
    * (term, doc) pairs.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
                maxPostings: Int): String =
    s"""WITH t AS (
  SELECT $idCol AS doc_id, unnest(list_distinct(string_split($textCol, ' '))) AS term
  FROM $table WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL),
r AS (SELECT term, doc_id,
  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS pos,
  count(*) OVER (PARTITION BY term) AS df FROM t)
SELECT term, df, CAST(pos AS BIGINT) AS pos, doc_id FROM r
WHERE pos <= $maxPostings ORDER BY term, pos"""
}
