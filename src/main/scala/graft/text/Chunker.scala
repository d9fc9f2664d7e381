package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG/embedding-prep splitter
  * ([[Packing]] packs whole documents INTO fixed context windows for
  * pretraining; this splits ONE document into overlapping retrieval
  * units): token windows of `chunkLen` starting every `stride =
  * chunkLen − overlap` tokens, the layout every vector store ingests.
  *
  * Declared layout (all integer arithmetic, reproducible from the text
  * alone): tokens are the whitespace split (the repo's string_split
  * contract, [[TextFunctions.tokens]]); starts are i·stride for
  * i = 0..L with L = ⌈(n − chunkLen)/stride⌉ when n > chunkLen else 0 —
  * every token lands in ≥ 1 chunk, the LAST chunk ends exactly at the
  * document end (it may overlap its predecessor by more than `overlap`;
  * the alternative — a short tail chunk — starves the tail of context,
  * so the deeper-overlap convention is the declared one). Zero-token
  * documents publish NO chunks (nothing to index); NULL text drops.
  *
  * Scale shape: pure scan-stage — one `transform` over a generated
  * index sequence per document, no shuffle, no window, splittable
  * files parallelize by row. Chunk count per doc is n/stride-sized;
  * a whale document explodes to its own chunk rows only (bounded by
  * `maxChunks` with an in-plan raise — a 10⁹-token "document" is a
  * concatenation bug, not data).
  */
object Chunker {

  /** One row per chunk: (idCol, chunk_idx, chunk_tokens, chunk_text). */
  def chunks(df: DataFrame, idCol: String, textCol: String, chunkLen: Int,
             overlap: Int, maxChunks: Long = 100000L): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(overlap >= 0 && overlap < chunkLen,
      s"overlap must lie in [0, chunkLen), got $overlap")
    require(maxChunks >= 1, s"maxChunks must be >= 1, got $maxChunks")
    val stride = chunkLen - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    // L = ceil((n - chunkLen)/stride) via integer div; 0 when n <= chunkLen
    val lastIdx = when(n > chunkLen,
      call_function("div",
        (n - chunkLen + stride - 1).cast("long"), lit(stride.toLong)))
      .otherwise(lit(0L))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"), n.as("__n"),
        when(lastIdx >= maxChunks, raise_error(concat(
          lit(s"chunker: document '"), col(idCol).cast("string"),
          lit(s"' yields more than $maxChunks chunks — a concatenation " +
            "bug, not data; raise maxChunks deliberately"))).cast("long"))
          .otherwise(lastIdx).as("__last"))
      .where(col("__n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("__last"))).as("chunk_idx"),
        col("__toks"), col("__n"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkLen.toLong),
          col("__n") - col("chunk_idx") * stride).as("chunk_tokens"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkLen)), " ")
          .as("chunk_text"))
  }

  /** DuckDB replay of [[chunks]]; `docsSql` yields (id, text). */
  def oracleSql(docsSql: String, idName: String, chunkLen: Int,
                overlap: Int): String = {
    val stride = chunkLen - overlap
    s"""WITH toks AS (
  SELECT id, string_split(text, ' ') AS tk, len(string_split(text, ' ')) AS n
  FROM ($docsSql) WHERE text IS NOT NULL),
lims AS (
  SELECT id, tk, n,
    CASE WHEN n > $chunkLen
      THEN (n - $chunkLen + $stride - 1) // $stride ELSE 0 END AS last
  FROM toks WHERE n > 0),
ex AS (
  SELECT id, tk, n, unnest(generate_series(0, last)) AS chunk_idx FROM lims)
SELECT id AS $idName, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(least($chunkLen, n - chunk_idx * $stride) AS BIGINT) AS chunk_tokens,
  array_to_string(tk[chunk_idx * $stride + 1 : chunk_idx * $stride + $chunkLen],
    ' ') AS chunk_text
FROM ex ORDER BY $idName, chunk_idx"""
  }
}
