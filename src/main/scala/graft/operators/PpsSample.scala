package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (bottom-k PPS) — the per-group
  * fixed-k draw beside [[graft.text.WeightedSample.systematic]]'s
  * expected-size systematic walk: k items per group with
  * inclusion probability (approximately) proportional to weight, the
  * corpus-curation primitive behind "sample training documents
  * proportional to quality score" and PPS survey draws. Method:
  * SEQUENTIAL POISSON sampling (Ohlsson 1998) — each item draws the
  * deterministic uniform u = hash60(key) mod 2⁵³ and ranks by the
  * priority u/w (here the truncating integer division `u div w` —
  * exact, engine-replayable); the k SMALLEST priorities win. A larger
  * weight divides its uniform down and can only move an item UP the
  * order (monotone, spec-pinned); equal weights collapse to the plain
  * content-hash sample ([[graft.text.CorpusFilters.sampleNPerGroup]]
  * — consistency spec-pinned).
  *
  * Same determinism ladder as the rest of the sampling family: no RNG,
  * stable under re-sharding and engine choice, ties (common after a
  * big-weight division floors to 0) break on ascending id — the
  * deterministic (priority asc, id asc) total order. Weights must be
  * POSITIVE integers (quantize upstream); zero/negative/NULL weights
  * raise in-plan — a silently-dropped weight would bias the draw.
  *
  * Scale shape: priority is scan-stage; the bottom-k rides
  * [[graft.functions.TopK]]'s bounded partial-agg buffer (≤k pairs per
  * (group, partition) ship — whale groups never sort).
  */
object PpsSample {

  /** Double-exact uniform range (the sampling-family convention). */
  val HashMod: Long = 1L << 53

  /** (groupCols*, rank, id, priority) — rank 1..n by ascending
    * priority; `weightCol` must be a positive integral column.
    */
  def ppsN(df: DataFrame, groupCols: Seq[String], key: Column, id: Column,
           weightCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    graft.Guards.requireIntegral(df, weightCol, "ppsN")
    val w = when(col(weightCol).isNull || col(weightCol).cast("long") <= 0L,
        raise_error(concat(lit("ppsN: weight must be a positive integer, got "),
          coalesce(col(weightCol).cast("string"), lit("NULL")))))
      .otherwise(col(weightCol).cast("long"))
    val pri = call_function("div",
      graft.text.TextFunctions.hash60(key.cast("string")) % HashMod, w)
    graft.functions.TopK
      .perGroup(df.withColumn("__pri", -pri), groupCols, col("__pri"), id, n)
      .select((groupCols.map(col) ++ Seq(
        col("rank").cast("long").as("rank"), col("id"),
        (-col("score")).cast("long").as("priority"))): _*)
  }

  /** DuckDB replay — the window formulation over the same priorities.
    * `keyE`/`idE`/`weightE` are SQL expressions over `table`.
    */
  def oracleSql(table: String, groupEs: Seq[String], keyE: String,
                idE: String, weightE: String, n: Int): String = {
    val g = groupEs.mkString(", ")
    val pr = s"((CAST(('0x'||substr(md5($keyE),1,15)) AS BIGINT) % $HashMod) // ($weightE))"
    s"""SELECT $g, CAST(rnk AS BIGINT) AS rank, id, priority FROM (
  SELECT $g, $idE AS id, $pr AS priority,
    row_number() OVER (PARTITION BY $g ORDER BY $pr ASC, $idE ASC) AS rnk
  FROM $table WHERE ($keyE) IS NOT NULL AND ($idE) IS NOT NULL)
WHERE rnk <= $n ORDER BY $g, rank"""
  }
}
