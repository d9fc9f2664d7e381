package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.storage.StorageLevel

/** Unigram language-model document scoring — the CCNet-style perplexity
  * proxy used to quality-rank web text before training ("docs whose token
  * distribution is far from the corpus LM are boilerplate / gibberish /
  * wrong-language"). Complements the rule-based
  * [[CorpusFilters]] quality signals with a distributional one, the way the
  * reference's quality stack layers heuristics (fabrix pipeline processors,
  * fabrix-core/src/fabrix/dataframe.rs transforms) — here the model IS the
  * corpus statistics.
  *
  * Model: a bounded top-`vocabSize` vocabulary with counts plus the total
  * training token count (including out-of-vocabulary mass). A token's cost
  * is its negative log-probability under the unsmoothed unigram LM,
  * quantized to fixed point for cross-engine exactness (the
  * [[graft.operators.Drift]] discipline):
  * `cost_q(t) = ⌊10⁶ · ln(total / cnt(t))⌋`, with unseen tokens priced at
  * pseudo-count 1 (`⌊10⁶ · ln(total)⌋` — the harshest in-model cost, the
  * standard floor for an unsmoothed table). A document's score is the SUM
  * of its tokens' costs plus the token/OOV counts, so mean-NLL ranking and
  * OOV-rate filtering both read off one pass.
  *
  * Shape at 100 TB:
  *  - '''train''' is one explode + partial-agg'd token count (ONE shuffle of
  *    8-byte-ish (term, cnt) partials), then a bounded
  *    `TakeOrderedAndProject` top-V cut — each partition ships ≤V rows, the
  *    [[graft.functions.TopK]] posture — and a counts-table sum for the
  *    total. The counts table is persisted across those two jobs so the
  *    corpus is exploded exactly once. The model materializes to the driver
  *    (V entries — a model artifact, like the IVF centroids), so scoring has
  *    NO lineage back to the training corpus.
  *  - '''score''' never shuffles raw text: explode → broadcast-hash join
  *    against the V-row vocab → per-doc partial-agg'd sums. A document's
  *    tokens are co-partitioned with it, so map-side partial aggregation
  *    collapses to ~one row per document before the exchange; a whale
  *    document costs local additions, not buffer growth (running sums, not
  *    collect_list).
  *
  * Determinism: counts and the quantized costs are integers; the single
  * double chain (one division, one `ln`, one floor — identical op order in
  * both engines) is the proven Drift/BM25/PMI parity pattern. The top-V cut
  * tie-breaks (cnt desc, term asc), so the vocabulary is engine- and
  * partitioning-independent even when V lands mid-tie.
  */
object UnigramLm {

  private val Scale = 1000000L

  /** A trained unigram LM: `vocab` holds the top-V (term, cnt) pairs in
    * (cnt desc, term asc) order; `totalTokens` is the full training token
    * count including OOV mass (the probability denominator).
    */
  final case class Model(vocab: Array[(String, Long)], totalTokens: Long) {
    require(totalTokens > 0, "model must be trained on a non-empty corpus")
  }

  /** The corpus token-count table (`term`, `cnt`) — ONE explode +
    * partial-agg'd shuffle. Feed it to
    * [[graft.operators.IncrementalAgg]] (group by term, Count) to maintain
    * the counts as a store under continuous ingest, then [[fromCounts]]
    * rebuilds the current model without re-scanning history.
    */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Train on a corpus: bounded top-`vocabSize` vocabulary + total count.
    * Whitespace tokenization ([[TextFunctions.tokens]] — empty tokens kept,
    * matching the corpus-stats family).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int): Model =
    fromCounts(tokenCounts(docs, textCol), vocabSize)

  /** Model from a (`term`, `cnt`) count table — the batch-train tail, and
    * the rebuild step over a maintained count store. The table is persisted
    * across the two jobs (total + top-V cut) so its lineage — a corpus
    * explode in batch train — evaluates exactly once.
    */
  def fromCounts(counts: DataFrame, vocabSize: Int): Model = {
    require(vocabSize > 0, "vocabSize must be positive")
    val c = counts.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = c.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
      require(total > 0, "no tokens in the count table")
      val vocab = c
        .orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      Model(vocab, total)
    } finally { c.unpersist() }
  }

  /** Score documents under a trained model: one row per non-NULL-text
    * document with `n_tokens`, `n_oov` (tokens outside the model
    * vocabulary), and `nll_q` = Σ ⌊10⁶·ln(total/cnt)⌋ over its tokens
    * (unseen → cnt 1). Rank ascending by `nll_q / n_tokens` for "most
    * natural first". Rows with NULL `textCol` are EXCLUDED (a missing
    * document has no token distribution to score; `coalesce` upstream if
    * they must count as empty — empty string scores as one empty token).
    */
  def scoreDocs(docs: DataFrame, model: Model,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = model.vocab.toSeq.toDF("term", "cnt")
    val toks = docs.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    // one division then one ln then one floor — the oracle replays the
    // identical double chain, keeping the float surface to a single ulp-
    // stable ln (see Drift)
    val cost = floor(lit(Scale.toDouble) *
        log(lit(model.totalTokens.toDouble) / coalesce(col("cnt"), lit(1L)).cast(DoubleType)))
      .cast(LongType)
    toks.join(broadcast(vocabDf), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(cost).as("nll_q"))
  }

  /** Train-then-score in one call — the gate shape (vocabulary and total
    * derived from the scored corpus itself, so the oracle is closed-form).
    */
  def scoreSelf(docs: DataFrame, vocabSize: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreDocs(docs, train(docs, textCol, vocabSize), idCol, textCol)

  /** DuckDB replay of [[scoreSelf]]: same tokenization, same (cnt desc,
    * term asc) top-V cut, same quantized-cost double chain.
    */
  def oracleSql(table: String, vocabSize: Int,
                idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH toks AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS term FROM $table),
       |cnts AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts),
       |vocab AS (SELECT term, cnt FROM cnts
       |  ORDER BY cnt DESC, term ASC LIMIT $vocabSize)
       |SELECT t.$idCol,
       |  count(*) AS n_tokens,
       |  coalesce(count(*) FILTER (WHERE v.cnt IS NULL), 0) AS n_oov,
       |  CAST(sum(CAST(floor($Scale.0 * ln(
       |    CAST(tot.total AS DOUBLE) / CAST(coalesce(v.cnt, 1) AS DOUBLE)))
       |    AS BIGINT)) AS BIGINT) AS nll_q
       |FROM toks t LEFT JOIN vocab v USING (term) CROSS JOIN tot
       |GROUP BY t.$idCol
       |ORDER BY t.$idCol""".stripMargin
}
