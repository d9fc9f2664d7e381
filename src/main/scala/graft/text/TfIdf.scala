package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level TF-IDF — term weighting for retrieval/quality filtering over
  * the `documents`-style tables.
  *
  * Shape at scale (N docs, V vocabulary):
  *  1. explode tokens → (doc_id, term) pairs, ONE shuffle hashed by
  *     (doc_id, term) for the tf counts;
  *  2. document frequency = second aggregation keyed by term (shuffle of the
  *     per-doc distinct (doc, term) pairs, already deduped by step 1 — far
  *     smaller than raw tokens);
  *  3. idf joins back onto the pairs BY TERM — a broadcast join when V fits
  *     (vocabularies are ≤ millions; per-term rows are 16 bytes), else a
  *     plain equi-join; either way never a pass over raw text again.
  *
  * The corpus doc count N rides along as a literal (one count job), not a
  * cross join.
  *
  * Determinism: tf/df/N are exact integers; the float idf/score is standard
  * smoothed `ln((1+N)/(1+df)) + 1` computed at the END from those integers,
  * so engine differences stay confined to the last double multiply (gate
  * checks the integers; the spec checks the doubles).
  */
object TfIdf {

  /** (doc_id, term, tf, df, n_docs, tf_idf) for every (document, term).
    *
    * @param broadcastVocab broadcast the per-term df table (right for
    *   vocabularies up to ~10^7 terms ≈ a few hundred MB); set false for
    *   open-vocabulary corpora to fall back to a shuffled equi-join
    */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            broadcastVocab: Boolean = true): DataFrame = {
    val n = docs.count()
    val pairs = docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    pairs.join(if (broadcastVocab) broadcast(dfreq) else dfreq, "term")
      .withColumn("n_docs", lit(n))
      .withColumn("tf_idf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("n_docs"), col("tf_idf"))
  }

  /** Top-k highest-scoring terms per document (ties → lexicographic term). */
  def topTerms(docs: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("tf_idf").desc, col("term").asc)
    tfIdf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** DuckDB oracle for the integer core (tf/df/N — floats don't hash-match
    * across engines; `TfIdfSpec` covers the score math).
    */
  def statsOracle(table: String, idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH pairs AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS term FROM $table),
       |tf AS (SELECT $idCol, term, count(*) AS tf FROM pairs GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
       |SELECT tf.$idCol, tf.term, tf.tf, dfreq.df,
       |  (SELECT count(*) FROM $table) AS n_docs
       |FROM tf JOIN dfreq USING (term)
       |ORDER BY $idCol, term""".stripMargin
}
