package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a query term set — the
  * retrieval primitive behind targeted data selection (rank a 100 TB
  * corpus by relevance to a seed query/domain before sampling it into a
  * training mix) and search-side serving over [[InvertedIndex]].
  *
  * Cross-engine exactness: BM25's term-frequency saturation factor is
  * RATIONAL for rational (k1, b) — with k1 = 6/5 and b = 3/4,
  *
  *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
  *     = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)
  *
  * where L = Σ dl (total corpus tokens) and N = doc count — so it is
  * computed as ONE integer division `(22·tf·L·SCALE) div (10·tf·L+3·L+9·dl·N)`,
  * bit-identical on any engine. The IDF factor
  * ln((N−df+0.5)/(df+0.5)) is irrational; it is quantized ONCE PER TERM
  * to `floor(SCALE·ln(·))` — the [[graft.functions.QuantizedDot]]
  * discipline: quantize the few inputs, then stay closed over the
  * integers (the per-(doc,term) hot path multiplies and sums longs
  * only). Caveat on the quantized ln: JVM `Math.log` and a C libm are
  * each within 1 ulp of the true value but not guaranteed to AGREE in
  * the last ulp, so `floor` could differ when SCALE·ln lands within
  * ~1 ulp of an integer — probability ≈ 2·SCALE·ulp ≈ 4·10⁻¹⁰ per
  * distinct (N, df), i.e. negligible per query and deterministic for a
  * fixed dataset (it either matches or it doesn't; it cannot flicker).
  * Magnitudes: idfQ ≤ SCALE·ln(N) ≈ 2·10⁷, tfQ ≤ 2.2·SCALE, so a
  * per-doc score over q query terms stays ≤ q·5·10¹³ — far inside Long.
  *
  * Scale shape (100 TB corpus): tokens explode in the scan stage and are
  * immediately filtered to the query's terms (an `isin` literal — a
  * broadcast in spirit, codegen'd in practice), so the ONLY shuffle keys
  * (doc, term) pairs that matched — proportional to query hits, not
  * corpus tokens. Corpus stats (N, L) are one scalar aggregate; per-term
  * df is an aggregate over the filtered postings; both ride broadcast
  * joins back onto the hit list. Nothing corpus-wide ever shuffles.
  *
  * Reference scope note: fabrix has no retrieval operators — extension
  * surface beside [[TfIdf]] and [[InvertedIndex]].
  */
object Bm25 {

  /** Quantization scale for the IDF factor and the tf fraction. */
  val Scale: Long = 1000000L

  /** (doc_id, n_hit_terms, score_scaled) for every document containing at
    * least one query term; `score_scaled` is BM25 in units of
    * 1/SCALE² with k1 = 6/5, b = 3/4 (see object doc for the exact
    * integer form). `queryTerms` are matched exactly against
    * whitespace-split tokens (normalize upstream to taste).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val base = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
    // one corpus pass feeds the stats aggregate and the hit explode
    val withLen = base.select(col("doc_id"), col("__toks"),
      size(col("__toks")).cast("long").as("dl"))
      .localCheckpoint(false)
    val stats = withLen.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    // postings restricted to query terms BEFORE any shuffle
    val hits = withLen
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = hits.groupBy("term").agg(count(lit(1)).as("df"))
    // idfQ = floor(SCALE · ln((N − df + 0.5)/(df + 0.5))), one row per
    // matched term — the only non-integer step, quantized before use
    val idfQ = df.crossJoin(broadcast(stats))
      .select(col("term"), floor(lit(Scale.toDouble) *
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))).cast("long").as("idf_q"))
    // true integer division (SQL `div`) — a double-division-then-cast
    // could misround across an integer boundary; div cannot
    val tfQ = expr(s"(22 * tf * total_len * $Scale) div " +
      "(10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)")
    hits
      .join(broadcast(idfQ), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), (col("idf_q") * tfQ).as("part"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("part")).as("score_scaled"))
  }

  /** DuckDB replay of [[score]] — same integer forms, same one-per-term
    * ln quantization, floor division via `//` on BIGINT (positive
    * operands, so truncation and floor coincide with Spark's `div`).
    */
  def oracleSql(table: String, idCol: String, textCol: String,
                queryTerms: Seq[String]): String = {
    val termList = queryTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH base AS (
  SELECT $idCol AS doc_id, string_split($textCol, ' ') AS toks
  FROM $table WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL),
wl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS total_len FROM wl),
hits AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM wl)
  WHERE term IN ($termList) GROUP BY doc_id, dl, term),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term),
idf AS (SELECT term,
  CAST(floor(${Scale}.0 * ln((n_docs - df + 0.5) / (df + 0.5))) AS BIGINT) AS idf_q
  FROM dfs, stats)
SELECT h.doc_id, count(*) AS n_hit_terms,
  CAST(sum(i.idf_q * ((22 * h.tf * s.total_len * ${Scale}) //
    (10 * h.tf * s.total_len + 3 * s.total_len + 9 * h.dl * s.n_docs))) AS BIGINT) AS score_scaled
FROM hits h JOIN idf i ON h.term = i.term, stats s
GROUP BY h.doc_id"""
  }
}
