package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation extraction — adjacent token pairs scored by pointwise
  * mutual information over the whole corpus: the phrase-mining step
  * (multi-word expressions, tokenizer-merge candidates, stopword-phrase
  * detection) a training-data pipeline runs before vocabulary decisions.
  *
  * PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ) with P(x,y) = c_xy/B over
  * adjacent-pair occurrences (B bigram tokens) and P(x) = c_x/T over
  * unigram occurrences (T tokens). Both engines compute the argument as
  * the SAME double expression tree (IEEE products/divisions of exactly-
  * representable counts are correctly rounded, hence identical), take one
  * ln, and quantize to `floor(SCALE·ln)` — so the gate hash-matches; the
  * raw counts ride along unquantized, so the exact evidence is in the
  * output too. (Same 1-ulp ln caveat as [[Bm25]]: the two engines' log
  * implementations could disagree in the last ulp exactly at a floor
  * boundary — probability ≈ 4·10⁻¹⁰ per distinct count tuple, and
  * deterministic for a fixed dataset.)
  *
  * Scale shape (100 TB corpus): bigram generation is scan-stage array
  * surgery ([[TextFunctions.shingles]] n=2 — the shifted zip, no
  * per-element lambda re-eval); the heavy shuffle keys (bigram) with
  * map-side partial counts; unigram counts are a second, smaller
  * aggregate; the two count joins are vocabulary-sized equi-joins where
  * each bigram row matches exactly one row per side — no fan-out, no
  * skew amplification (a stopword unigram joins MANY bigrams, but that
  * is the bigram side's row count, not duplication). `minCount` prunes
  * the hapax tail before the joins, which is where a web corpus'
  * long-tail bigram mass dies.
  *
  * Reference scope note: fabrix has no corpus-statistics operators —
  * extension surface beside [[TfIdf]] and [[Bm25]].
  */
object Collocations {

  /** Quantization scale for the PMI value. */
  val Scale: Long = 1000000L

  /** (x, y, c_xy, c_x, c_y, pmi_q) for adjacent pairs with
    * c_xy ≥ minCount; pmi_q = floor(SCALE · PMI).
    */
  def pmi(docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(false)
    val uni = toks.select(explode(col("__toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    // every document splits to >= 1 token, so B = Σ(len−1) = T − n_docs
    // exactly — one aggregate yields both corpus constants
    val totals = toks.agg(
        sum(size(col("__toks"))).cast("long").as("T"),
        count(lit(1)).as("__nd"))
      .withColumn("B", col("T") - col("__nd"))
    // adjacent pairs by zipping the token array with its own 1-shifted
    // slice (the shingles discipline: per-ROW evaluation, no interpreted
    // lambda re-eval); zip_with pads the tail with null → filtered out,
    // so a 1-token document contributes zero pairs
    val bi = toks
      .select(explode(zip_with(col("__toks"),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .where(col("p.y").isNotNull)
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    val joined = bi
      .join(uni.select(col("t").as("x"), col("c").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("c_y")), "y")
      .crossJoin(broadcast(totals))
    // identical double expression tree on both engines: parenthesized
    // left-to-right so every intermediate is the same IEEE value
    val arg = col("c_xy").cast("double") * col("T").cast("double") /
      col("B").cast("double") * col("T").cast("double") /
      col("c_x").cast("double") / col("c_y").cast("double")
    joined.select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
      floor(lit(Scale.toDouble) * log(arg)).cast("long").as("pmi_q"))
  }

  /** DuckDB replay of [[pmi]] — same counts, same parenthesized double
    * chain, same floor quantization.
    */
  def oracleSql(table: String, textCol: String, minCount: Long = 5L): String =
    s"""WITH toks AS (
  SELECT string_split($textCol, ' ') AS tk FROM $table WHERE $textCol IS NOT NULL),
uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t),
tot AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS tok_total,
  CAST(sum(len(tk)) - count(*) AS BIGINT) AS bg_total FROM toks),
pairs AS (SELECT tk[i] AS x, tk[i+1] AS y
  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i)),
bi AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM pairs
  GROUP BY x, y HAVING count(*) >= $minCount)
SELECT bi.x, bi.y, bi.c_xy, ux.c AS c_x, uy.c AS c_y,
  CAST(floor(${Scale}.0 * ln(
    CAST(bi.c_xy AS DOUBLE) * CAST(tok_total AS DOUBLE) / CAST(bg_total AS DOUBLE)
      * CAST(tok_total AS DOUBLE) / CAST(ux.c AS DOUBLE) / CAST(uy.c AS DOUBLE)))
    AS BIGINT) AS pmi_q
FROM bi JOIN uni ux ON bi.x = ux.t JOIN uni uy ON bi.y = uy.t, tot"""
}
