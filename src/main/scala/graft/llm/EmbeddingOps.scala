package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column storage/compression primitives: int8 quantization and
  * L2 normalization. At 100 TB the embedding store dominates ANN memory —
  * symmetric int8 quantization cuts it 4× (float32 → int8 per dim) at a
  * bounded precision cost (≤ m/254 per element, m = the vector's max |x|),
  * which is the standard trade every large-scale vector index
  * (FAISS-style) makes before anything fancier like PQ.
  *
  * Determinism contract: quantized codes are integers produced by a fixed
  * IEEE-double formula — `floor(x · 127/m + 1/2)` — so two engines (or two
  * cluster layouts) produce bit-identical codes; the DuckDB oracle replays
  * the formula exactly. No RNG, no codebook training.
  *
  * All combinators are pure Column HOFs (interpreted, not codegen'd — fine
  * off the hot loop; the pair-scoring hot path stays on
  * [[graft.functions.QuantizedDot]]).
  */
object EmbeddingOps {

  /** max |x| of the vector in double — the symmetric quantization range. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization: code_i = floor(x_i · 127/m + 1/2) ∈
    * [-127, 127]; the all-zero vector quantizes to all-zero codes. The
    * explicit floor(+1/2) (not round()) pins half-way behavior to one
    * engine-independent formula.
    */
  def quantizeInt8(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => floor(x.cast("double") * (lit(127.0) / m) + 0.5).cast("int")))
  }

  /** The quantization range as a fixed-point int (floor(m·10⁴)) — store it
    * beside the codes; integer so results hash identically across engines.
    */
  def rangeQ4(vec: Column): Column =
    floor(maxAbs(vec) * 1e4).cast("long")

  /** Reconstruction: x̂_i = code_i · m/127 (double). Max per-element error
    * is m/254 by construction.
    */
  def dequantize(codes: Column, m: Column): Column =
    transform(codes, c => c.cast("double") * (m.cast("double") / lit(127.0)))

  /** L2 normalization in double; zero vectors stay zero. */
  def l2Normalize(vec: Column): Column = {
    val n = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(n === 0.0, transform(vec, x => x.cast("double")))
      .otherwise(transform(vec, x => x.cast("double") / n))
  }

  // ------------------------------------------------- DuckDB oracle SQL ----

  /** Oracle for [[quantizeInt8]] + [[rangeQ4]] over a list-of-float column. */
  def quantizeOracle(table: String, idCol: String, vecCol: String): String =
    s"""WITH t AS (SELECT $idCol,
  $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m
FROM $table)
SELECT $idCol,
  CASE WHEN m = 0 THEN list_transform(v, x -> 0)
       ELSE list_transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / m) + 0.5) AS INTEGER)) END AS qvec,
  CAST(floor(m * 10000) AS BIGINT) AS m_q4
FROM t ORDER BY $idCol""".stripMargin
}
