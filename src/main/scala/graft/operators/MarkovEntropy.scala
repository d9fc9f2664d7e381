package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markov entropy rate — how PREDICTABLE is the next event given the
  * current one: per state i, the conditional entropy H_i = −Σ_j
  * p(j|i)·ln p(j|i) of its outgoing transitions, and the chain's entropy
  * rate H = Σ_i p(i)·H_i. The sequence-regularity readout behind bot
  * detection (machine flows have near-zero rate), UX funnel health (high
  * rate = users wander), and compressibility estimates for event logs —
  * the per-state view names WHICH states are the unpredictable ones.
  *
  * Exact semantics: transition counts are exact integers off the
  * [[graft.llm.EventWindows.eventTransitions]] matrix; each entropy term
  * is ONE quantized double chain (the [[Contingency.mutualInfoCells]]
  * discipline): `⌊10⁶·(n_ij/n_i)·ln(n_i/n_ij)⌋` for the per-state
  * entropy and `⌊10⁶·(n_ij/N)·ln(n_i/n_ij)⌋` for the rate contribution —
  * per-term floors sum exactly, so both published sums hash cross-engine;
  * a single-successor state contributes exactly 0 (ln 1). Total entropy
  * rate = Σ over states of `rate_q6` (in 10⁻⁶ nats).
  *
  * Scale shape: operates on the |types|²-bounded transition matrix, not
  * corpus rows — per-state totals re-aggregate the matrix and ride a
  * broadcast join back (the transitions posture); one matrix-sized
  * aggregate ends it.
  */
object MarkovEntropy {

  val Scale = 1000000L

  /** Per state: (from_type, n_out, n_next, h_q6, rate_q6) over a
    * (from_type, to_type, n) transition-count frame.
    */
  def fromTransitions(trans: DataFrame): DataFrame = {
    val ft = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__ni"), count(lit(1)).as("__nnext"))
    val tot = trans.agg(sum(col("n")).as("__nt"))
    val nD = col("n").cast("double")
    val niD = col("__ni").cast("double")
    val ntD = col("__nt").cast("double")
    val lnRatio = log(niD / nD)
    trans.join(broadcast(ft), "from_type")
      .crossJoin(broadcast(tot))
      .select(col("from_type"), col("__ni"), col("__nnext"),
        floor(lit(Scale.toDouble) * (nD / niD) * lnRatio).cast("long").as("__h"),
        floor(lit(Scale.toDouble) * (nD / ntD) * lnRatio).cast("long").as("__r"))
      .groupBy(col("from_type"))
      .agg(max(col("__ni")).as("n_out"), max(col("__nnext")).as("n_next"),
        sum(col("__h")).as("h_q6"), sum(col("__r")).as("rate_q6"))
  }

  /** DuckDB replay — `transSql` yields (from_type, to_type, n); same
    * double chain, same per-term floors.
    */
  def oracleSql(transSql: String): String =
    s"""WITH tr AS ($transSql),
ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS ni,
  CAST(count(*) AS BIGINT) AS nnext FROM tr GROUP BY from_type),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM tr),
terms AS (SELECT tr.from_type, ft.ni, ft.nnext,
  CAST(floor($Scale * (CAST(tr.n AS DOUBLE) / CAST(ft.ni AS DOUBLE)) *
    ln(CAST(ft.ni AS DOUBLE) / CAST(tr.n AS DOUBLE))) AS BIGINT) AS h,
  CAST(floor($Scale * (CAST(tr.n AS DOUBLE) / CAST(tot.nt AS DOUBLE)) *
    ln(CAST(ft.ni AS DOUBLE) / CAST(tr.n AS DOUBLE))) AS BIGINT) AS r
  FROM tr JOIN ft ON tr.from_type = ft.from_type CROSS JOIN tot)
SELECT from_type, max(ni) AS n_out, max(nnext) AS n_next,
  CAST(sum(h) AS BIGINT) AS h_q6, CAST(sum(r) AS BIGINT) AS rate_q6
FROM terms GROUP BY from_type ORDER BY from_type"""
}
