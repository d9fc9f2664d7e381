package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — every (document, start position) where the
  * EXACT token sequence occurs: the retrieval primitive BM25 (bag of
  * words) cannot answer ("new york" ≠ "york new"), behind quote queries,
  * contamination span lookups, and n-gram provenance checks.
  *
  * The classical index-side plan is k−1 self-joins of positional
  * postings on (doc, pos+1); this collapses them into ONE shuffle via
  * anchor alignment: a posting (term, pos) fills phrase slot j whenever
  * phrase(j) = term, every filled slot votes for anchor = pos − j, and
  * a start position is a match iff its anchor collects all k DISTINCT
  * slots (a repeated phrase term — "a b a" — legitimately fills two
  * slots from different positions; distinct-slot counting handles it).
  *
  * Scale shape: the slot lookup is a literal broadcast map evaluated in
  * the SCAN stage, so only postings of the ≤k phrase terms survive to
  * the single (doc, anchor)-keyed partial-agg'd count — corpus-sized
  * input, phrase-hit-sized shuffle. Tokenization is the repo's
  * whitespace convention ([[TextFunctions.tokens]]), positions 1-based;
  * an empty phrase raises at build time; NULL id/text rows drop.
  */
object PhraseSearch {

  /** (doc_id, start_pos) for every occurrence, 1-based positions. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must carry at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phrase tokens must be non-empty and space-free, got $phrase")
    val k = phrase.length
    // term -> slots it fills (a term can appear at several slots)
    val slotMap = phrase.zipWithIndex.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2.toLong) }
    val slotLit = typedlit(slotMap)
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p0", "__term")))
      .where(col("__term").isin(phrase.distinct: _*))
      .select(col("doc_id"), (col("__p0") + 1).cast("long").as("__pos"),
        explode(element_at(slotLit, col("__term"))).as("__slot"))
      .select(col("doc_id"), col("__slot"),
        (col("__pos") - col("__slot")).as("__anchor"))
      .where(col("__anchor") >= 1L)
      .groupBy(col("doc_id"), col("__anchor"))
      .agg(count_distinct(col("__slot")).as("__filled"))
      .where(col("__filled") === k.toLong)
      .select(col("doc_id"), col("__anchor").as("start_pos"))
  }

  /** Per-document hit counts for matched documents only:
    * (doc_id, n_hits, first_pos).
    */
  def phraseCounts(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame =
    phraseMatches(docs, idCol, textCol, phrase)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("start_pos").as("first_pos"))

  /** DuckDB replay — the direct sliding-window form over the same
    * whitespace tokens (an oracle shape, not an index plan).
    */
  def matchesOracle(table: String, idCol: String, textCol: String,
                    phrase: Seq[String]): String = {
    val k = phrase.length
    val conds = phrase.zipWithIndex.map { case (t, j) =>
      s"t[i+$j] = '${t.replace("'", "''")}'" }.mkString(" AND ")
    s"""SELECT doc_id, CAST(unnest(list_filter(
    generate_series(1, greatest(len(t) - ${k - 1}, 0)), i -> $conds))
  AS BIGINT) AS start_pos
FROM (SELECT $idCol AS doc_id, string_split($textCol, ' ') AS t
  FROM $table WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL)
ORDER BY doc_id, start_pos"""
  }

  def countsOracle(table: String, idCol: String, textCol: String,
                   phrase: Seq[String]): String =
    s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
  CAST(min(start_pos) AS BIGINT) AS first_pos
FROM (${matchesOracle(table, idCol, textCol, phrase)})
GROUP BY doc_id ORDER BY doc_id"""
}
