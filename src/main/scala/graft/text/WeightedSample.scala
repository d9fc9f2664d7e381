package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted systematic sampling — pick rows with expected
  * multiplicity proportional to an integer weight, by walking a fixed
  * step along the cumulative-weight axis: row r (cumulative interval
  * (cum−w, cum]) is emitted `⌊cum/step⌋ − ⌊(cum−w)/step⌋` times. The
  * training-mix primitive (sample documents ∝ quality/length weight into
  * a target token budget) that float-free exactness allows an oracle to
  * replay: every quantity is integer arithmetic over a deterministic
  * (idCol-ordered) cumulative sum, so the picked set is bit-identical on
  * any engine — no RNG, no float u^(1/w) priorities.
  *
  * Statistical contract: systematic sampling — inclusion probability
  * min(w/step, …) per pass with multiplicity for w ≥ step (heavy rows
  * legitimately repeat: epoch-style oversampling); variance is lower
  * than Poisson sampling at the same budget, at the price of the fixed
  * grid (fine for corpus mixing; use stratified for per-group floors).
  *
  * Scale shape (100 TB corpus): the cumulative sum is the
  * [[Packing.packAssignments]] two-level prefix — per-bucket windows in
  * parallel, one tiny bucket-totals pass, broadcast offsets back — so
  * nothing corpus-wide ever funnels through one partition.
  */
object WeightedSample {

  /** (idCol, weight, n_copies ≥ 1) — systematic picks along the
    * idCol-ordered cumulative weight axis. `weight` must be a
    * non-negative integer expression; `step` is the weight mass between
    * picks (expected picks ≈ Σw / step).
    */
  def systematic(df: DataFrame, idCol: String, weight: Column, step: Long,
                 bucketSize: Int = 4096): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    Packing.packAssignments(df, idCol, weight, ctxLen = 1, bucketSize = bucketSize)
      .select(col(idCol), col("n_tokens").as("weight"),
        (expr(s"(start_offset + n_tokens) div $step") -
          expr(s"start_offset div $step")).as("n_copies"))
      .where(col("n_copies") >= 1)
  }

  /** DuckDB replay of [[systematic]] — plain window cumsum (the oracle
    * can afford the single-partition form), same integer arithmetic.
    */
  def oracleSql(table: String, idCol: String, weightSql: String,
                step: Long): String =
    s"""WITH c AS (SELECT $idCol, CAST($weightSql AS BIGINT) AS weight,
  sum(CAST($weightSql AS BIGINT)) OVER (ORDER BY $idCol ROWS UNBOUNDED PRECEDING) AS cum
  FROM $table)
SELECT $idCol, weight,
  CAST((cum // $step) - ((cum - weight) // $step) AS BIGINT) AS n_copies
FROM c WHERE (cum // $step) - ((cum - weight) // $step) >= 1"""
}
