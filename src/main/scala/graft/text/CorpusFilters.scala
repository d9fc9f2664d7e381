package graft.text

import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-preparation filters a web-scale training pipeline runs between raw
  * scrape and tokenizer: text normalization, PII scrubbing, deterministic
  * train/validation splitting, and repetition (duplicate-n-gram) metrics in
  * the style of the C4/Gopher quality rules.
  *
  * All scalar ops are pure codegen'd Column combinators (no UDFs), and every
  * regex sticks to the Java-regex ∩ RE2 common subset (no lookaround, no
  * backrefs) so a DuckDB oracle replays them byte-identically. The
  * repetition metric is the one shuffle-bearing op and keeps the standard
  * explode → partial-agg count shape.
  *
  * Reference scope note: the fabrix reference has no corpus operators — this
  * is the LLM-pipeline extension surface (SURVEY §2.11) built on
  * [[TextFunctions]].
  */
object CorpusFilters {

  // ------------------------------------------------------- normalization --

  /** Canonical text form: lowercase, whitespace runs collapsed to one
    * space, ends trimmed — the usual pre-fingerprint normalization so
    * "Hello  World " and "hello world" dedup together.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** [[normalizeText]] over a SQL expression (DuckDB needs the explicit
    * global flag; Spark's regexp_replace is global by default).
    */
  def normalizeSql(e: String): String =
    s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  // --------------------------------------------------------- PII scrubbing --

  /** Patterns live in the Java-regex ∩ RE2 subset. Order matters and is part
    * of the contract: URLs first (an email-looking userinfo inside a URL
    * must scrub as part of the URL), then emails, then phone-shaped digit
    * runs over what remains.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def scrubPii(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    regexp_replace(noEmail, PhonePattern, "<PHONE>")
  }

  /** Match counts on the RAW text (pre-scrub) — the per-doc PII load a
    * filtering policy thresholds on.
    */
  def nUrls(c: Column): Column = regexp_count(c, lit(UrlPattern))
  def nEmails(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def nPhones(c: Column): Column = regexp_count(c, lit(PhonePattern))

  // The pattern constants contain no single quotes, so they embed verbatim
  // in SQL string literals (standard single-quoted strings pass backslashes
  // through untouched — both engines see the identical regex text).
  def scrubPiiSql(e: String): String = {
    val noUrl = s"regexp_replace($e, '$UrlPattern', '<URL>', 'g')"
    val noEmail = s"regexp_replace($noUrl, '$EmailPattern', '<EMAIL>', 'g')"
    s"regexp_replace($noEmail, '$PhonePattern', '<PHONE>', 'g')"
  }

  def countSql(e: String, pattern: String): String =
    s"len(regexp_extract_all($e, '$pattern'))"

  // ------------------------------------------------- train/val splitting --

  /** Deterministic content-hash bucket in [0, nBuckets): stable under
    * re-sharding, re-ordering, and engine choice (keyed on the 60-bit md5
    * fingerprint, not on row position — the property that keeps a document
    * in the same split across pipeline re-runs).
    */
  def splitBucket(key: Column, nBuckets: Int): Column =
    hash60(key) % nBuckets

  /** 'train' for buckets below `trainPct` (of 100), 'val' otherwise. */
  def splitAssign(key: Column, trainPct: Int): Column =
    when(splitBucket(key, 100) < trainPct, lit("train")).otherwise(lit("val"))

  def splitBucketSql(e: String, nBuckets: Int): String =
    s"CAST(('0x'||substr(md5($e),1,15)) AS BIGINT) % $nBuckets"

  def splitAssignSql(e: String, trainPct: Int): String =
    s"CASE WHEN ${splitBucketSql(e, 100)} < $trainPct THEN 'train' ELSE 'val' END"

  /** Deterministic stratified sampling: keep a row iff its content-hash
    * bucket (0..99) is below the stratum's percentage — per-language /
    * per-source mixture weighting, the data-mixing primitive of corpus
    * assembly. Keyed on content (not row position or RNG), so the sample is
    * stable under re-sharding, re-ordering, and engine choice, and a
    * document keeps or loses its slot consistently across pipeline re-runs.
    * Pure codegen'd predicate — evaluated in the scan stage, no shuffle, no
    * sample() RNG whose draw depends on partitioning.
    */
  def stratifiedKeep(key: Column, strata: Column,
                     rates: Seq[(String, Int)], defaultPct: Int): Column = {
    val pct = rates.foldRight(lit(defaultPct): Column) {
      case ((s, p), acc) => when(strata === s, lit(p)).otherwise(acc)
    }
    splitBucket(key, 100) < pct
  }

  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       rates: Seq[(String, Int)], defaultPct: Int): DataFrame =
    df.where(stratifiedKeep(key, strata, rates, defaultPct))

  def stratifiedKeepSql(keyE: String, strataE: String,
                        rates: Seq[(String, Int)], defaultPct: Int): String = {
    val cases = rates.map { case (s, p) => s"WHEN $strataE = '$s' THEN $p" }.mkString(" ")
    s"${splitBucketSql(keyE, 100)} < (CASE $cases ELSE $defaultPct END)"
  }

  /** Deterministic fixed-size per-group sample: the `n` rows of each group
    * whose content hash ranks lowest (ties → lowest id) — "exactly N docs
    * per domain", the other half of corpus mixing beside the percentage
    * form above. Hash-ranked, so the sample is stable under re-sharding
    * and engine choice like [[stratifiedSample]]; fixed-N, unlike the
    * percentage form, so whale groups can't flood the mixture.
    *
    * Scale shape: rides [[graft.functions.TopK]]'s bounded buffer — each
    * map partition ships ≤n (hash, id) pairs per group instead of
    * window-sorting every group member, exactly the whale-domain case a
    * 100 TB corpus has. Returns (group cols, rank, id) — join back by id
    * for the rows.
    *
    * The hash is folded to 53 bits ([[SampleHashMod]]) because the rank
    * rides TopK's (Double, Long) buffer — every distinct 53-bit value
    * survives the double round-trip, so operator and oracle order
    * identically (a raw 60-bit hash could see two distinct values round
    * to one double and flip a near-collision's tiebreak).
    */
  def sampleNPerGroup(df: DataFrame, groupCols: Seq[String],
                      key: Column, id: Column, n: Int): DataFrame =
    graft.functions.TopK
      .perGroup(df.withColumn("__sk", -(hash60(key) % SampleHashMod)),
        groupCols, col("__sk"), id, n)
      .withColumn("rank", col("rank").cast("long"))
      .drop("score")

  /** Double-exact sampling-hash range (see [[sampleNPerGroup]]). */
  private val SampleHashMod = 1L << 53

  /** Global fixed-N sample: the `n` documents whose content hash ranks
    * lowest corpus-wide — [[sampleNPerGroup]] with no grouping (the TopK
    * aggregate runs as a global partial+final pair: each map partition
    * ships ≤n pairs, the final merge keeps n — no global sort). Same
    * determinism contract as the rest of the sampling family: stable under
    * re-sharding, re-ordering, engine choice, and nested (a smaller n is a
    * prefix of a larger n's sample).
    */
  def sampleN(df: DataFrame, key: Column, id: Column, n: Int): DataFrame =
    sampleNPerGroup(df, Seq.empty, key, id, n)

  /** Oracle for [[sampleN]] — the global window formulation. */
  def sampleNSql(table: String, keyE: String, idE: String, n: Int): String = {
    val h = s"(CAST(('0x'||substr(md5($keyE),1,15)) AS BIGINT) % $SampleHashMod)"
    s"""SELECT CAST(rnk AS BIGINT) AS rank, $idE AS id FROM (
  SELECT $idE, row_number() OVER (ORDER BY $h ASC, $idE ASC) AS rnk
  FROM $table WHERE $keyE IS NOT NULL AND $idE IS NOT NULL)
WHERE rnk <= $n ORDER BY rank""".stripMargin
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * published web-corpus heuristics), integerized so every comparison is
    * exact integer arithmetic — no float ratio whose rounding could differ
    * at a threshold boundary between engines:
    *
    *  - `wordsOk`:    token count within [minWords, maxWords]
    *  - `meanLenOk`:  mean token length within [minMeanLen, maxMeanLen]
    *                  (as `minMeanLen·n ≤ Σlen ≤ maxMeanLen·n`)
    *  - `symbolOk`:   `#`/`...` symbol count ≤ maxSymbolPer10Words per 10
    *                  words (cross-multiplied)
    *  - `alphaOk`:    words containing a letter ≥ minAlphaPer10Words per 10
    *  - `stopwordOk`: at least minStopwords stopword hits
    *
    * All scan-stage Column arithmetic — zero shuffle; `keep` is the AND.
    */
  final case class GopherRules(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Int = 3, maxMeanLen: Int = 10,
      maxSymbolPer10Words: Int = 1,
      minAlphaPer10Words: Int = 8,
      minStopwords: Int = 2)

  /** The five rule predicates as (name, Column) pairs — the single source
    * both the flag view and the filter build from.
    */
  private def gopherPredicates(text: Column, r: GopherRules): Seq[(String, Column)] = {
    val t = tokens(text)
    val n = size(t).cast("long")
    val sumLen = sumTokenLen(text)
    // non-overlapping match counting, same idiom as nUrls/nEmails above
    val symbols = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))).cast("long")
    val alphaWords = size(filter(t, w => w.rlike("[A-Za-z]"))).cast("long")
    Seq(
      "words_ok" -> (n >= r.minWords && n <= r.maxWords),
      "mean_len_ok" ->
        (sumLen >= lit(r.minMeanLen.toLong) * n && sumLen <= lit(r.maxMeanLen.toLong) * n),
      "symbol_ok" -> (symbols * 10 <= lit(r.maxSymbolPer10Words.toLong) * n),
      "alpha_ok" -> (alphaWords * 10 >= lit(r.minAlphaPer10Words.toLong) * n),
      "stopword_ok" ->
        (graft.text.TextFunctions.stopwordCount(text) >= r.minStopwords))
  }

  /** Per-rule booleans (see [[GopherRules]]) as named columns on `df`, plus
    * their AND as `keep`. The six names are part of this API's contract —
    * pre-existing columns with those names are overwritten.
    */
  def gopherFlags(df: DataFrame, textCol: String, r: GopherRules): DataFrame = {
    val preds = gopherPredicates(col(textCol), r)
    val flagged = preds.foldLeft(df) { case (d, (name, p)) => d.withColumn(name, p) }
    flagged.withColumn("keep", preds.map(_._2).reduce(_ && _))
  }

  /** The filter form: rows passing every rule. Applies the predicates
    * directly in the WHERE — no columns added, so the input schema (and
    * any caller column that happens to be named `keep`) passes through
    * untouched.
    */
  def gopherFilter(df: DataFrame, textCol: String, r: GopherRules = GopherRules()): DataFrame =
    df.where(gopherPredicates(col(textCol), r).map(_._2).reduce(_ && _))

  /** Oracle for [[gopherFlags]] — the same integer arithmetic in SQL; each
    * predicate is written exactly once (`keep` references the flag aliases
    * laterally, like the Spark side ANDs the same predicate Columns).
    */
  def gopherFlagsSql(table: String, idCol: String, textCol: String,
                     r: GopherRules): String = {
    import graft.text.TextFunctions.{sqlList, Stopwords}
    s"""WITH g AS (
  SELECT $idCol,
    CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n,
    CAST(list_sum(list_transform(string_split($textCol, ' '), x -> length(x))) AS BIGINT) AS sum_len,
    CAST(${countSql(textCol, "#")} + ${countSql(textCol, "\\.\\.\\.")} AS BIGINT) AS symbols,
    CAST(len(list_filter(string_split($textCol, ' '), x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
    CAST(len(list_filter(string_split($textCol, ' '), x -> x IN (${sqlList(Stopwords)}))) AS BIGINT) AS stop_n
  FROM $table)
SELECT $idCol,
  (n >= ${r.minWords} AND n <= ${r.maxWords}) AS words_ok,
  (sum_len >= ${r.minMeanLen} * n AND sum_len <= ${r.maxMeanLen} * n) AS mean_len_ok,
  (symbols * 10 <= ${r.maxSymbolPer10Words} * n) AS symbol_ok,
  (alpha_words * 10 >= ${r.minAlphaPer10Words} * n) AS alpha_ok,
  (stop_n >= ${r.minStopwords}) AS stopword_ok,
  (words_ok AND mean_len_ok AND symbol_ok AND alpha_ok AND stopword_ok) AS keep
FROM g ORDER BY $idCol""".stripMargin
  }

  /** Deterministic curriculum mix: per-source document quotas — the
    * "30k from web, 10k from code, 2k from math" step that assembles a
    * training mixture from a filtered corpus. [[sampleNPerGroup]]
    * generalized to a per-group N: rank every quoted source's docs by
    * content hash (bounded TopK buffer, k = the largest quota), then keep
    * each source's lowest `quota(source)` ranks via a broadcast map
    * literal — codegen'd `element_at`, no join. Sources absent from
    * `quotas` are excluded entirely (quota 0).
    *
    * Hash-ranked like the rest of the sampling family, so the mixture is
    * stable under re-sharding, re-ingestion order, and engine choice, and
    * nested quotas agree: lowering a quota yields a subset of the larger
    * mixture (ranks don't depend on the quota).
    */
  def mixSources(df: DataFrame, sourceCol: String, key: Column, id: Column,
                 quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty, "mixSources needs at least one source quota")
    require(quotas.values.forall(_ > 0), s"quotas must be positive: $quotas")
    val kmax = quotas.values.max
    val quoted = df.where(col(sourceCol).isin(quotas.keys.toSeq: _*))
    sampleNPerGroup(quoted, Seq(sourceCol), key, id, kmax)
      .where(col("rank") <= element_at(typedlit(quotas), col(sourceCol)))
  }

  /** Oracle for [[mixSources]] — the window formulation with a CASE quota. */
  def mixSourcesSql(table: String, sourceE: String, keyE: String, idE: String,
                    quotas: Map[String, Int]): String = {
    val h = s"(CAST(('0x'||substr(md5($keyE),1,15)) AS BIGINT) % $SampleHashMod)"
    val srcs = quotas.keys.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    val cases = quotas.toSeq.sortBy(_._1)
      .map { case (s, n) => s"WHEN $sourceE = '$s' THEN $n" }.mkString(" ")
    s"""SELECT $sourceE, CAST(rnk AS BIGINT) AS rank, $idE AS id FROM (
  SELECT $sourceE, $idE, row_number() OVER (PARTITION BY $sourceE ORDER BY $h ASC, $idE ASC) AS rnk
  FROM $table WHERE $sourceE IN ($srcs) AND $keyE IS NOT NULL AND $idE IS NOT NULL)
WHERE rnk <= (CASE $cases END) ORDER BY $sourceE, rank""".stripMargin
  }

  /** Deterministic training-shard assignment: shard = content-hash mod
    * `nShards`. Content-keyed like the sampling family, so a document's
    * shard never depends on partitioning, ingestion order, or engine — the
    * property a resumable multi-epoch training job needs (re-materializing
    * the corpus never moves a document between shards, so data loaders can
    * checkpoint per shard).
    *
    * Scale shape: pure scan-stage codegen'd arithmetic — ZERO shuffle for
    * the assignment itself. Materializing shard FILES is
    * [[writeShards]]' hive-partitioned write; that shuffle belongs to the
    * write, not the operator.
    */
  def assignShards(df: DataFrame, key: Column, nShards: Int,
                   shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn(shardCol, (hash60(key) % nShards).cast("int"))
  }

  /** Oracle fragment for [[assignShards]]'s shard column. */
  def assignShardsSql(keyE: String, nShards: Int): String =
    s"CAST((CAST(('0x'||substr(md5($keyE),1,15)) AS BIGINT) % $nShards) AS INTEGER)"

  /** Materialize training shards: one hive partition per shard, rows
    * within a shard ordered by (content hash, id) — fully deterministic
    * file content, re-runnable to byte-identical shards modulo parquet
    * encoding. One shuffle (the repartition on shard); the within-shard
    * sort is per-partition and spill-backed, never a global sort.
    */
  def writeShards(df: DataFrame, key: Column, id: Column, nShards: Int,
                  outDir: String, shardCol: String = "shard"): Unit =
    assignShards(df, key, nShards, shardCol)
      .withColumn("__wk", hash60(key))
      .repartition(nShards, col(shardCol))
      // the shard column leads the sort: the dynamic-partition write
      // requires partition-columns-first ordering, so this prefix keeps
      // the planner from inserting a SECOND sort on shard (which would
      // both double the sort cost and leave the (hash, id) order at the
      // mercy of that sort's stability)
      .sortWithinPartitions(col(shardCol), col("__wk"), id)
      .drop("__wk")
      .write.partitionBy(shardCol).mode("overwrite").parquet(outDir)

  /** Oracle for [[sampleNPerGroup]]: the window formulation over the same
    * folded hash, ascending (TopK is max-first, hence the negation).
    */
  def sampleNPerGroupSql(table: String, groupEs: Seq[String], keyE: String,
                         idE: String, n: Int): String = {
    val g = groupEs.mkString(", ")
    val h = s"(CAST(('0x'||substr(md5($keyE),1,15)) AS BIGINT) % $SampleHashMod)"
    // NULL key/id rows are unrankable and dropped (TopK.perGroup contract)
    s"""SELECT $g, CAST(rnk AS BIGINT) AS rank, $idE AS id FROM (
  SELECT $g, $idE, row_number() OVER (PARTITION BY $g ORDER BY $h ASC, $idE ASC) AS rnk
  FROM $table WHERE $keyE IS NOT NULL AND $idE IS NOT NULL)
WHERE rnk <= $n ORDER BY $g, rank""".stripMargin
  }

  // ------------------------------------------------- vocabulary / OOV ----

  /** Top-N corpus vocabulary by token frequency, ties broken by token text —
    * a total order, so the vocab is deterministic across partitionings and
    * engines. One explode + partial-agg'd count; the result is tiny by
    * construction (N rows) and lives on the driver like a stopword list.
    */
  def buildVocab(df: DataFrame, textCol: String, topN: Int): Seq[String] = {
    import graft.text.TextFunctions.tokens
    df.select(explode(tokens(col(textCol))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tk").asc)
      .limit(topN)
      .select("tk").collect().map(_.getString(0)).toSeq
  }

  /** Per-document out-of-vocabulary stats against a fixed vocab: token
    * count, OOV count, OOV rate — the cheap vocabulary-coverage quality
    * signal (high OOV ⇒ wrong language / encoding noise / gibberish).
    *
    * Scale shape: the vocab embeds as an InSet literal (fine to ~10⁴-10⁵
    * entries — codegen'd hash-set membership, evaluated in the scan stage,
    * zero shuffle). For larger vocabularies switch to the explode +
    * broadcast-join formulation; the numbers are identical.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocab: Seq[String]): DataFrame = {
    import graft.text.TextFunctions.tokens
    val t = tokens(col(textCol))
    val nTok = size(t).cast("long")
    val nOov = size(filter(t, tk => !tk.isInCollection(vocab))).cast("long")
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      nOov.as("n_oov"),
      (nOov.cast(DoubleType) / nTok).as("oov_rate"))
  }

  /** Oracle for [[buildVocab]] + [[oovStats]] fused: the explode/left-join
    * formulation — proving the InSet scan-stage form equivalent.
    */
  def oovOracle(table: String, idCol: String, textCol: String, topN: Int): String =
    s"""WITH tok AS (SELECT $idCol, unnest(string_split($textCol, ' ')) AS tk FROM $table),
cnt AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
vocab AS (SELECT tk FROM cnt ORDER BY c DESC, tk ASC LIMIT $topN),
j AS (SELECT t.$idCol, v.tk IS NOT NULL AS in_v FROM tok t LEFT JOIN vocab v USING (tk))
SELECT $idCol, count(*) AS n_tokens,
  CAST(sum(CASE WHEN in_v THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
  CAST(sum(CASE WHEN in_v THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS oov_rate
FROM j GROUP BY $idCol ORDER BY $idCol""".stripMargin

  // ------------------------------------------------------- repetition ----

  /** Gopher-style repetition metrics: per document, the total n-gram count,
    * the top n-gram's occurrence count, and the fraction of n-gram
    * occurrences that are repeats (grams occurring ≥ 2×). High
    * dup_gram_frac ⇒ boilerplate / spam / template text.
    *
    * Scale shape: explode n-grams once, count per (doc, gram) — a single
    * shuffle with map-side partial counts — then one keyed re-agg per doc.
    * Never holds a per-doc gram map in one row (an aggregate-HOF frequency
    * map would be O(grams²) interpreted per row).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val grams = df.select(col(idCol), explode(shingles(col(textCol), n)).as("gram"))
    val perGram = grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
    perGram.groupBy(idCol).agg(
        sum("c").as("n_grams"),
        max("c").as("top_gram_count"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_gram_occurrences"))
      .select(col(idCol), col("n_grams"), col("top_gram_count"), col("dup_gram_occurrences"),
        (col("dup_gram_occurrences").cast(DoubleType) / col("n_grams")).as("dup_gram_frac"))
  }

  def repetitionOracle(table: String, idCol: String, textCol: String, n: Int = 2): String = {
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    s"""WITH toks AS (SELECT $idCol, string_split($textCol, ' ') AS t FROM $table),
g AS (SELECT $idCol, unnest(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END) AS gram FROM toks),
c AS (SELECT $idCol, gram, count(*) AS c FROM g GROUP BY $idCol, gram)
SELECT $idCol, CAST(sum(c) AS BIGINT) AS n_grams, max(c) AS top_gram_count,
  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_gram_occurrences,
  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS dup_gram_frac
FROM c GROUP BY $idCol ORDER BY $idCol""".stripMargin
  }
}
