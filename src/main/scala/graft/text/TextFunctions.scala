package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for large-scale training-data pipelines —
  * tokenization, shingling, quality metrics, language ID, fingerprints.
  *
  * Everything here is a pure `Column` combinator over Spark's built-in
  * (codegen'd) functions — no UDFs, no driver round-trips — so every operator
  * stays inside whole-stage codegen and scales linearly with executors.
  *
  * Cross-engine determinism: the hash primitive is built on md5 (identical
  * bytes on every engine) rather than Spark-internal xxhash/murmur, so
  * results are reproducible outside Spark (the DuckDB differential oracle
  * replays the same arithmetic).
  */
object TextFunctions {

  /** Mersenne prime 2^31-1 — modulus keeping all hash arithmetic well inside
    * Long range on any SQL engine (no unsigned / overflow divergence).
    */
  val P: Long = 2147483647L

  /** Second modulus used to shrink the 60-bit md5 prefix before affine
    * transforms (a*h+b stays < 2^47).
    */
  val M: Long = 1000000007L

  /** Deterministic 60-bit hash of a string: first 15 hex chars of md5.
    * Engine-portable: DuckDB `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
    * Computed by the native [[graft.functions.Md5Prefix60]] expression
    * (digest bytes → Long directly, codegen'd) rather than the
    * conv∘substring∘md5 chain — same values, no hex-string/Decimal detour
    * in the per-shingle hot loop.
    */
  def hash60(c: Column): Column = graft.functions.Md5Prefix60(c)

  /** hash60 reduced mod M — the working hash for minhash/simhash. */
  def hashM(c: Column): Column = hash60(c) % M

  /** Whitespace tokenization on single spaces (keeps empty tokens like the
    * SQL string_split contract, so counts match across engines; callers
    * wanting collapsed whitespace should regexp_replace first).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** BPE-ish token count: word-characters runs + individual punctuation,
    * the usual cheap proxy for LLM token counting.
    */
  def approxBpeCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]"))

  /** n-token shingles as strings; documents shorter than n yield the whole
    * text as a single shingle so no document silently disappears from
    * dedup ("a tweet-sized doc still dedups").
    *
    * Built from shifted-array zips, NOT `transform(sequence, i =>
    * element_at(tokens, i+j))`: higher-order functions are interpreted (no
    * codegen, no subexpression elimination), so an expression referenced
    * inside a lambda body re-evaluates per ELEMENT — the element_at form
    * re-splits the whole document for every shingle position, O(tokens²)
    * per row. Here every zip_with/slice child is evaluated once per ROW:
    * zipping the token array with its own 1..n-1-shifted slices pads the
    * tail with nulls (concat propagates them) and array_compact drops them,
    * leaving exactly the size-n+1 in-order n-grams.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val joined = (1 until n).foldLeft(t) { (acc, j) =>
      zip_with(acc, slice(t, lit(j + 1), greatest(size(t) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(t) < n, array(concat_ws(" ", t))).otherwise(array_compact(joined))
  }

  /** Distinct shingle set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  // ------------------------------------------------------------- quality --

  /** Default stopword list (English function words; ASCII only so every
    * engine tokenizes identically).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "is", "are", "to", "in", "on", "for", "with")

  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Quality metrics bundle: token count, distinct-token count, stopword
    * count/ratio, mean token length — the length/punct/stopword heuristics
    * used to score web-scraped documents before training.
    */
  def nTokens(text: Column): Column = size(tokens(text))
  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text)))
  def stopwordCount(text: Column, words: Seq[String] = Stopwords): Column =
    countIn(tokens(text), words)
  def stopwordRatio(text: Column, words: Seq[String] = Stopwords): Column =
    stopwordCount(text, words).cast("double") / nTokens(text)

  /** Sum of token lengths (chars excluding separators). */
  def sumTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
  def meanTokenLen(text: Column): Column =
    sumTokenLen(text).cast("double") / nTokens(text)

  // ------------------------------------------------------------- lang id --

  /** Marker-word sets per language — a tiny n-gram/stopword heuristic
    * language identifier. Deterministic argmax, first language in
    * [[LangOrder]] wins ties, "und" when nothing matches.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "un", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3", "ta1", "zhe4"))

  val LangOrder: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  def langScore(text: Column, lang: String): Column =
    countIn(tokens(text), LangMarkers(lang))

  /** Predicted language: argmax of marker counts (ties → LangOrder). */
  def langId(text: Column): Column = {
    val scores = LangOrder.map(l => langScore(text, l))
    val m = greatest(scores: _*)
    LangOrder.zip(scores)
      .foldRight(lit("und")) { case ((l, s), acc) => when(m > 0 && s === m, lit(l)).otherwise(acc) }
  }

  /** Language-ID confidence margin: top marker count minus runner-up —
    * the "how sure was the classifier" companion to [[langId]] (margin 0
    * = a tie the [[LangOrder]] rule broke arbitrarily, or no markers at
    * all: route those docs to review / drop instead of trusting the
    * label). Exact integers via a sorted score array — scan-stage, and
    * the oracle sorts the same list.
    */
  def langIdMargin(text: Column): Column = {
    val sorted = sort_array(array(LangOrder.map(l => langScore(text, l)): _*), asc = false)
    (element_at(sorted, 1) - element_at(sorted, 2)).cast("long")
  }

  /** Character-class composition: (n_chars, n_alpha, n_digit, n_space,
    * n_other) — the encoding-noise screen beside the token-level quality
    * metrics (mojibake, binary-in-text, markup soup all show up as an
    * `n_other` spike before any tokenizer runs). ASCII classes only, so
    * both engines count identical sets; each count is one
    * delete-and-measure regex (`length(s) − length(remove(class))`),
    * scan-stage, n_other derived by subtraction — one pass, no
    * per-character explosion.
    */
  def charClassCounts(text: Column): Column = {
    def without(pattern: String): Column =
      length(text) - length(regexp_replace(text, pattern, ""))
    val n = length(text).cast("long")
    val alpha = without("[A-Za-z]").cast("long")
    val digit = without("[0-9]").cast("long")
    // ASCII whitespace incl. tab/newline/CR/FF — ordinary multi-line text
    // must NOT read as encoding noise; the explicit class is identical in
    // Java regex and RE2
    val space = without("[ \\t\\n\\r\\f]").cast("long")
    struct(
      n.as("n_chars"), alpha.as("n_alpha"), digit.as("n_digit"),
      space.as("n_space"), (n - alpha - digit - space).as("n_other"))
  }

  /** Oracle for [[charClassCounts]] — same delete-and-measure regexes
    * (DuckDB needs the 'g' flag for replace-all; Spark's default).
    */
  def charClassOracle(table: String, idCol: String, textCol: String): String = {
    def without(p: String): String =
      s"length($textCol) - length(regexp_replace($textCol, '$p', '', 'g'))"
    val ws = "[ \\t\\n\\r\\f]"
    s"""SELECT $idCol,
CAST(length($textCol) AS BIGINT) AS n_chars,
CAST(${without("[A-Za-z]")} AS BIGINT) AS n_alpha,
CAST(${without("[0-9]")} AS BIGINT) AS n_digit,
CAST(${without(ws)} AS BIGINT) AS n_space,
CAST(length($textCol) - (${without("[A-Za-z]")}) - (${without("[0-9]")})
  - (${without(ws)}) AS BIGINT) AS n_other
FROM $table ORDER BY $idCol""".stripMargin
  }

  // -------------------------------------------------------- fingerprints --

  /** Whole-document fingerprint (md5-based 60-bit). Identical documents ⇒
    * identical fingerprints on any engine; the exact-dedup key at scale
    * (group by 8-byte long, not by multi-KB text).
    */
  def fingerprint(text: Column): Column = hash60(text)

  /** Content-defined rolling fingerprint: min of shingle hashes — stable
    * under small edits away from the minimal shingle (a 1-hash MinHash).
    */
  def rollingFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingleSet(text, n), s => hashM(s)))

  // ------------------------------------------------- DuckDB oracle SQL ----
  // Generated from the same constant tables as the Column code above, so the
  // Spark path and the differential oracle cannot drift.

  private[graft] def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(",")

  /** Shared CTE chain ending in relation `lp` carrying a `lang_pred` column
    * (the token array `t` rides along for downstream filters). Both
    * [[langIdOracle]] and [[graft.llm.CorpusPipeline.cleanOracle]] compose
    * from this, so the lang-id SQL shape lives in exactly one place.
    */
  private[graft] def langPredCtes(table: String, textCol: String, cols: String): String = {
    val scores = LangOrder.map(l =>
      s"len(list_filter(t, x -> x IN (${sqlList(LangMarkers(l))}))) AS s_$l").mkString(", ")
    val cases = LangOrder.map(l => s"WHEN mx > 0 AND s_$l = mx THEN '$l'").mkString(" ")
    s"""WITH toks AS (SELECT $cols, string_split($textCol, ' ') AS t FROM $table),
sc AS (SELECT *, $scores FROM toks),
m AS (SELECT *, greatest(${LangOrder.map("s_" + _).mkString(",")}) AS mx FROM sc),
lp AS (SELECT *, CASE $cases ELSE 'und' END AS lang_pred FROM m)"""
  }

  /** Oracle for [[fingerprint]] + [[rollingFingerprint]] (same shingle CTE
    * shape as the minhash oracle).
    */
  def fingerprintOracle(table: String, idCol: String, textCol: String, n: Int = 3): String = {
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    s"""WITH toks AS (SELECT $idCol, $textCol AS txt, string_split($textCol, ' ') AS t FROM $table),
sh AS (SELECT $idCol, txt, list_distinct(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END) AS s FROM toks)
SELECT $idCol, CAST(('0x'||substr(md5(txt),1,15)) AS BIGINT) AS fp,
  list_min(list_transform(s, x -> CAST(('0x'||substr(md5(x),1,15)) AS BIGINT) % $M)) AS rolling_fp
FROM sh ORDER BY $idCol""".stripMargin
  }

  /** Oracle for the quality-metrics bundle (token counts as BIGINT to match
    * DuckDB's len()).
    */
  def qualityOracle(table: String, idCol: String, textCol: String): String =
    s"""WITH toks AS (SELECT $idCol, string_split($textCol, ' ') AS t FROM $table)
SELECT $idCol, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
  CAST(len(list_filter(t, x -> x IN (${sqlList(Stopwords)}))) AS DOUBLE) / len(t) AS stop_ratio,
  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mean_tok_len
FROM toks ORDER BY $idCol""".stripMargin

  /** Oracle for langId: CASE order = LangOrder (first match wins), identical
    * to the foldRight in [[langId]].
    */
  def langIdOracle(table: String, idCol: String, langCol: String, textCol: String): String = {
    s"""${langPredCtes(table, textCol, s"$idCol, $langCol")}
SELECT $idCol, $langCol, lang_pred FROM lp ORDER BY $idCol""".stripMargin
  }

  /** Oracle for the label-vs-prediction confusion matrix (the lang-id
    * EVALUATION step: off-diagonal mass = labeling or detector error,
    * routed to review before either is trusted) — same prediction CTEs,
    * one partial-agg'd pair count.
    */
  def langConfusionOracle(table: String, langCol: String, textCol: String): String =
    s"""${langPredCtes(table, textCol, langCol)}
SELECT $langCol, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM lp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Oracle for [[langIdMargin]] alongside the prediction — same score
    * CTEs, same descending sort of the score list.
    */
  def langMarginOracle(table: String, idCol: String, textCol: String): String = {
    val list = LangOrder.map("s_" + _).mkString("[", ", ", "]")
    s"""${langPredCtes(table, textCol, idCol)}
SELECT $idCol, lang_pred,
  CAST(list_sort($list, 'DESC')[1] - list_sort($list, 'DESC')[2] AS BIGINT) AS margin
FROM lp ORDER BY $idCol""".stripMargin
  }
}
