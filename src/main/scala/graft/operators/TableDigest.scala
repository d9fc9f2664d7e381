package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent table content digest — "is this snapshot
  * byte-for-byte the same data?" answered in one aggregate, with no
  * sort and no row shipping: the cheap equality check behind snapshot
  * promotion, replica reconciliation, cache invalidation, and
  * migration sign-off (the [[graft.sources.SnapshotDiff]] row-level
  * diff says WHAT changed; this says WHETHER, at a fraction of the
  * cost).
  *
  * Each row canonicalizes to one 60-bit fingerprint — columns rendered
  * to strings with an unambiguous NULL sentinel and a field separator
  * that cannot collide with content (unit separator \\u001F), then
  * md5-prefixed — and the digest is three commutative reductions over
  * row fingerprints: `n_rows`, `xor_digest` (order/partition
  * independent, but duplicate PAIRS cancel), and `sum_digest` =
  * Σ fingerprints in DECIMAL(38,0) published canonically (catches what
  * XOR cancels — an even number of identical rows). Together with the
  * count, matching all three is content equality up to 60-bit collision
  * odds. Column ORDER and the column set are part of the identity
  * (digesting a projection digests that projection), documented.
  *
  * Scale: one scan-stage fingerprint + one partial-agg'd grand
  * aggregate — commutative, so any partitioning and any row order give
  * bit-identical digests (spec-pinned under repartition).
  */
object TableDigest {

  private val Sep = "\u001F"
  private val NullMark = "N"

  /** One row: (n_rows, xor_digest, sum_digest). Digests every column in
    * the frame's current order.
    */
  def digest(df: DataFrame): DataFrame = {
    // length-prefixed fields ("3:abc") make the rendering SELF-DELIMITING:
    // content containing the separator (or a string equal to the old bare
    // sentinel) can no longer collide — a bare "N" is unambiguous because
    // every real field starts with digits and a colon (r10 review fix)
    val rendered = df.columns.map { c =>
      val sc = col(c).cast("string")
      when(sc.isNull, lit(NullMark))
        .otherwise(concat(length(sc).cast("string"), lit(":"), sc))
    }
    val fp = graft.functions.Md5Prefix60(
      concat_ws(Sep, rendered: _*))
    df.select(fp.as("__fp"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__fp)"), lit(0L)).as("xor_digest"),
        coalesce(sum(col("__fp").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).cast("string").as("sum_digest"))
  }

  /** DuckDB replay — same rendering, same md5-60 fingerprint, same
    * three reductions. `colsSql` must list the same columns in the same
    * order with the same string rendering.
    */
  def oracleSql(table: String, colsSql: Seq[String]): String = {
    val rendered = colsSql
      .map(c => s"CASE WHEN $c IS NULL THEN 'N' ELSE " +
        s"CAST(length(CAST($c AS VARCHAR)) AS VARCHAR) || ':' || CAST($c AS VARCHAR) END")
      .mkString(" || chr(31) || ")
    s"""WITH f AS (SELECT CAST(('0x'||substr(md5($rendered),1,15)) AS BIGINT) AS fp
  FROM $table)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  COALESCE(bit_xor(fp), 0) AS xor_digest,
  CAST(COALESCE(sum(CAST(fp AS HUGEINT)), 0) AS VARCHAR) AS sum_digest
FROM f"""
  }
}
