package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: lay the corpus out as one deterministic token stream
  * (document order = id order) and chop it into fixed-size context windows —
  * the step that turns a cleaned corpus into training sequences. Each
  * document is assigned to the chunk containing its START offset (documents
  * may straddle a boundary; the assignment is by start, so every document
  * lands in exactly one chunk and the layout is reproducible from (id,
  * token-count) alone).
  *
  * Scale shape (100 TB): the naive formulation is a running sum over a
  * TOTAL order — `sum() OVER (ORDER BY id)` with no partition collapses the
  * whole corpus into ONE task. This implementation is the classic two-level
  * prefix sum instead: coarse buckets of ids are cumsum'd independently
  * (`Window.partitionBy(bucket)` — parallel across executors), bucket
  * TOTALS (one row per bucket, ~corpus/bucketSize rows) are prefix-summed
  * in a single tiny task, and the per-bucket offsets broadcast-join back.
  * Total cost: one parallel window + one broadcast join; no global sort of
  * the corpus, no single-partition window over row data.
  *
  * Reference scope note: the fabrix reference has no corpus operators — this
  * is the LLM-pipeline extension surface (SURVEY §2.11).
  */
object Packing {

  /** Per-document chunk assignment: (`idCol`, n_tokens, start_offset,
    * chunk_id). `tokens` is the per-document token count expression (e.g.
    * [[TextFunctions.nTokens]]); `idCol` must be numeric — bucket =
    * id div `bucketSize` is the coarse prefix-sum level.
    */
  def packAssignments(
      df: DataFrame, idCol: String, tokens: Column,
      ctxLen: Int, bucketSize: Int = 4096): DataFrame = {
    val perDoc = df.select(
      col(idCol).as("__id"),
      tokens.cast(LongType).as("n_tokens"),
      floor(col(idCol) / lit(bucketSize)).cast(LongType).as("__bucket"))
    // level 1: cumsum within each bucket — parallel across buckets
    val withinW = Window.partitionBy("__bucket").orderBy("__id")
    val within = perDoc.withColumn("__cum", sum("n_tokens").over(withinW))
    // level 2: prefix offsets of bucket totals — one row per bucket, so the
    // single-partition window touches ~nRows/bucketSize rows, not the corpus
    val totalsW = Window.orderBy("__bucket")
    val offsets = perDoc.groupBy("__bucket").agg(sum("n_tokens").as("__btot"))
      .withColumn("__boff", coalesce(
        sum("__btot").over(totalsW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bucket", "__boff")
    within.join(broadcast(offsets), "__bucket")
      .select(
        col("__id").as(idCol),
        col("n_tokens"),
        (col("__boff") + col("__cum") - col("n_tokens")).as("start_offset"))
      .withColumn("chunk_id", expr(s"start_offset DIV $ctxLen"))
  }

  /** Per-chunk layout stats: how many documents start in each context
    * window, their token mass, and the id span — the packing manifest.
    */
  def chunkStats(
      df: DataFrame, idCol: String, tokens: Column,
      ctxLen: Int, bucketSize: Int = 4096): DataFrame =
    packAssignments(df, idCol, tokens, ctxLen, bucketSize)
      .groupBy("chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("chunk_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Overlapping token-window chunking (RAG ingestion / context-window
    * prep): each document yields chunks of `chunkTokens` tokens starting
    * every `stride` tokens (stride < chunkTokens ⇒ overlap), last chunk
    * truncated. Pure per-row array surgery — evaluated in the scan stage,
    * no shuffle, no state; trivially parallel at any scale. Deterministic
    * layout from (text, chunkTokens, stride) alone.
    */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val t = TextFunctions.tokens(col(textCol))
    val chunks = transform(
      sequence(lit(1), size(t), lit(stride)),
      start => struct(
        start.as("start_token"),
        slice(t, start, lit(chunkTokens)).as("toks")))
    df.select(col(idCol), explode(chunks).as("c"))
      .select(
        col(idCol),
        expr(s"CAST((c.start_token - 1) DIV $stride + 1 AS BIGINT)").as("chunk_id"),
        col("c.start_token").cast("long").as("start_token"),
        size(col("c.toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c.toks")).as("chunk_text"))
  }

  /** Content-defined chunking — the shift-resistant sibling of
    * [[chunkDocs]] and the standard remedy for fixed-block dedup's edit
    * exposure (insert one token and every fixed block after it changes;
    * CDC boundaries are chosen by CONTENT, so chunks after an edit
    * realign): cut before token i whenever the hash of the n-token
    * shingle STARTING at i satisfies `hash mod divisor = 0` — expected
    * chunk length ≈ `divisor` tokens, boundaries reproducible from text
    * alone. Emits each chunk's 60-bit fingerprint, so
    * `groupBy("chunk_fp")` is chunk-level dedup directly.
    *
    * Pure per-row scan-stage array surgery (the [[chunkDocs]] posture):
    * no shuffle, no state, trivially parallel; per-doc cost is O(tokens)
    * hashes. Same md5-60 arithmetic the DuckDB oracle replays
    * bit-identically ([[TextFunctions.hash60]]).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                n: Int = 3, divisor: Long = 16L): DataFrame = {
    require(n > 0, "shingle width must be positive")
    require(divisor > 0, "divisor must be positive")
    // Every intermediate array is materialized as a COLUMN before a
    // lambda touches it (the [[TextFunctions.shingles]] discipline):
    // higher-order functions are interpreted with no subexpression
    // elimination, so an EXPRESSION referenced in a lambda body
    // re-evaluates per element — an element_at(shingles(text), i) form
    // here was O(tokens³) per document. Attribute reads are O(1); each
    // step below is one pass over its input array per row.
    // NULL text yields no chunks (explicit, matching the oracle filter —
    // the null would otherwise silently propagate to zero rows here but
    // to a spurious NULL-fingerprint row in a SQL replay)
    val base = df.where(col(textCol).isNotNull).select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"),
      TextFunctions.shingles(col(textCol), n).as("__sh"))
    // one pass: token position i+1 (the start of shingle index i,
    // 0-based) is a boundary when the shingle hash hits the residue;
    // position 1 is never a boundary (i >= 1)
    val marks = transform(col("__sh"), (s, i) =>
      when(i >= 1 && TextFunctions.hash60(s) % divisor === 0L, i + 1)
        .otherwise(lit(null).cast("int")))
    val withStarts = base.select(col(idCol), col("__t"),
      concat(array(lit(1)), filter(marks, x => x.isNotNull)).as("__starts"))
    // ends = starts shifted left by one, padded with len+1 — slices, not
    // per-element indexing
    val withBoth = withStarts.select(col(idCol), col("__t"), col("__starts"),
      concat(
        slice(col("__starts"), lit(2), greatest(size(col("__starts")) - 1, lit(0))),
        array(size(col("__t")) + 1)).as("__ends"))
    val zipped = zip_with(col("__starts"), col("__ends"), (s0, e0) => struct(
      s0.cast(LongType).as("start_token"),
      (e0 - s0).cast(LongType).as("n_toks"),
      TextFunctions.hash60(concat_ws(" ", slice(col("__t"), s0, e0 - s0)))
        .as("fp")))
    withBoth
      .select(col(idCol), posexplode(zipped).as(Seq("__pos", "c")))
      .select(
        col(idCol),
        (col("__pos") + 1).cast(LongType).as("chunk_idx"),
        col("c.start_token").as("start_token"),
        col("c.n_toks").as("n_tokens"),
        col("c.fp").as("chunk_fp"))
  }

  /** DuckDB replay of [[cdcChunks]]: same ordered shingles, same md5-60
    * boundary predicate, same slice fingerprints.
    */
  def cdcChunksOracle(table: String, idCol: String, textCol: String,
                      n: Int = 3, divisor: Long = 16L): String = {
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    def h(x: String): String = s"CAST(('0x'||substr(md5($x),1,15)) AS BIGINT)"
    s"""WITH toks AS (SELECT $idCol, string_split($textCol, ' ') AS t FROM $table
       |  WHERE $textCol IS NOT NULL),
       |sh AS (SELECT $idCol, t, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
       |  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END AS s
       |  FROM toks),
       |st AS (SELECT $idCol, t,
       |  [1] || CASE WHEN len(s) >= 2
       |    THEN list_filter(generate_series(2, len(s)),
       |           i -> ${h("s[i]")} % $divisor = 0)
       |    ELSE [] END AS starts
       |  FROM sh),
       |ex AS (SELECT $idCol, t, starts,
       |  unnest(generate_series(1, len(starts))) AS j FROM st)
       |SELECT $idCol, CAST(j AS BIGINT) AS chunk_idx,
       |  CAST(starts[j] AS BIGINT) AS start_token,
       |  CAST(coalesce(starts[j+1], len(t)+1) - starts[j] AS BIGINT) AS n_tokens,
       |  ${h(s"array_to_string(t[starts[j] : coalesce(starts[j+1], len(t)+1) - 1], ' ')")}
       |    AS chunk_fp
       |FROM ex ORDER BY $idCol, chunk_idx""".stripMargin
  }

  /** Oracle for [[chunkDocs]] — same windows via generate_series + list
    * slicing; chunk index recovered arithmetically from the start offset.
    */
  def chunkDocsOracle(table: String, idCol: String, textCol: String,
                      chunkTokens: Int, stride: Int): String =
    s"""WITH toks AS (SELECT $idCol, string_split($textCol, ' ') AS t FROM $table),
st AS (SELECT $idCol, t, unnest(generate_series(1, len(t), $stride)) AS start_token FROM toks)
SELECT $idCol, (start_token - 1) // $stride + 1 AS chunk_id,
  CAST(start_token AS BIGINT) AS start_token,
  CAST(len(t[start_token : start_token + ${chunkTokens - 1}]) AS BIGINT) AS n_tokens,
  array_to_string(t[start_token : start_token + ${chunkTokens - 1}], ' ') AS chunk_text
FROM st ORDER BY $idCol, chunk_id""".stripMargin

  // ------------------------------------------------- DuckDB oracle SQL ----
  // The two-level prefix sum is algebraically the plain global running sum,
  // so the oracle uses the direct window form — same numbers, and the gate
  // thereby proves the decomposition correct.

  /** Oracle for [[chunkStats]] with token count = whitespace token count of
    * `textCol` (the [[TextFunctions.nTokens]] contract).
    */
  def chunkStatsOracle(table: String, idCol: String, textCol: String, ctxLen: Int): String =
    s"""WITH t AS (SELECT $idCol, CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n_tokens FROM $table),
c AS (SELECT $idCol, n_tokens,
  sum(n_tokens) OVER (ORDER BY $idCol ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset FROM t),
a AS (SELECT $idCol, n_tokens, CAST(start_offset // $ctxLen AS BIGINT) AS chunk_id FROM c)
SELECT chunk_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
  min($idCol) AS first_doc, max($idCol) AS last_doc
FROM a GROUP BY chunk_id ORDER BY chunk_id""".stripMargin
}
