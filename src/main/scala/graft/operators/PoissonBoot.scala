package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — the ONLY bootstrap that works at
  * cluster scale: classical resampling draws n rows WITH replacement per
  * replicate (a global operation, unrunnable distributed), while the
  * Poisson approximation gives every row an independent Poisson(1)
  * multiplicity per replicate, so R resampled estimates fall out of ONE
  * partial-agg'd scan with R weighted sums (the Chamandy et al. /
  * streaming-bootstrap construction, standard at fleet scale). The
  * uncertainty readout for sums and means that t-intervals get wrong on
  * skewed long-tailed data — revenue, latency, token counts.
  *
  * Determinism is the repo's hash discipline, not an RNG: row i's weight
  * in replicate r derives from `hash60(id || ':' || r)`
  * ([[graft.functions.Md5Prefix60]]) compared against the DECLARED
  * constants ⌊CDF_Poisson(1)(k)·2⁶⁰⌋ — exact integer comparisons, no
  * floats anywhere, bit-replayable by the DuckDB md5-prefix convention.
  * Weights cap at 9 (P(W ≥ 9) ≈ 1.1·10⁻⁶ per draw, declared truncation).
  * Same inputs → same replicates on any engine, any partitioning, any
  * day — a bootstrap CI that hash-gates.
  *
  * Scale shape: ONE scan, R weighted sums per group, all partial-agg'd
  * map-side; output is group-sized (R rows or one summary row per
  * group). No shuffle of raw rows beyond the group collapse, no window,
  * no driver materialization. R is a declared small constant (≤ 64):
  * cost is R md5 calls per row — the operator's hot loop, priced like
  * minhash shingling.
  *
  * Contracts: integral values (|x|·9 per row must fit the Long sum —
  * ANSI raises loudly); NULL id/value rows drop; NULL groups are a real
  * stratum; `loRank`/`hiRank` are 1-based order statistics of the R
  * replicate sums (percentile CIs are the caller's rank choice, e.g.
  * R = 40, lo = 2, hi = 39 ≈ a 90% interval).
  */
object PoissonBoot {

  /** ⌊CDF_Poisson(1)(k)·2⁶⁰⌋ for k = 0..8 — hash60 below Thresholds(k)
    * means weight ≤ k. Declared constants shared verbatim with
    * [[oracleCase]].
    */
  val Thresholds: Array[Long] = Array(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L, 1152909688087595836L, 1152920207336574738L)

  val MaxWeight = 9L

  private def aggAll(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, reps: Int): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps must be in [2, 64], got $reps")
    graft.Guards.requireIntegral(df, valueCol, "poissonBoot")
    // ONE custom aggregate carries all R replicate sums, so the R md5
    // draws of a row happen exactly once (an expression form gets
    // inlined into every aggregate by projection collapse — 32 weight
    // arrays per row; functions/PoissonBootAgg is the r11 fix,
    // bit-equality with the per-column md5 chain spec-pinned)
    // R md5 draws per row is the operator's hot loop — fan the projected
    // narrow rows out to cluster parallelism when the scan came in as a
    // single split (guide §2.5; no-op at scale where splits >= cores)
    val rows = graft.Guards.fanOut(df
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__x")))
    val agg = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        graft.functions.PoissonBootAgg(reps)(col("__id"), col("__x"))
          .as("__b"))
    val ests = (1 to reps).map(r => element_at(col("__b"), r).as(s"__e$r"))
    agg.select(Seq(col(groupCol), col("n"), col("total")) ++ ests: _*)
  }

  /** One row per (group, replicate): (groupCol, rep, boot_sum) — the raw
    * resampled sums, for callers who want their own functional of the
    * bootstrap distribution.
    */
  def replicates(df: DataFrame, groupCol: String, idCol: String,
                 valueCol: String, reps: Int = 32): DataFrame =
    aggAll(df, groupCol, idCol, valueCol, reps)
      .select(col(groupCol), explode(array((1 to reps).map(r =>
        struct(lit(r).as("rep"), col(s"__e$r").as("boot_sum"))): _*)).as("__e"))
      .select(col(groupCol), col("__e.rep").as("rep"),
        col("__e.boot_sum").as("boot_sum"))

  /** One row per group: (groupCol, n, total, boot_lo, boot_hi) — the
    * exact total plus the loRank-th / hiRank-th smallest replicate sums.
    */
  def summary(df: DataFrame, groupCol: String, idCol: String,
              valueCol: String, reps: Int = 32, loRank: Int = 2,
              hiRank: Int = 31): DataFrame = {
    require(loRank >= 1 && hiRank <= 64 && loRank <= hiRank,
      s"ranks must satisfy 1 <= loRank <= hiRank <= reps, got $loRank..$hiRank")
    require(hiRank <= reps, s"hiRank $hiRank exceeds reps $reps")
    aggAll(df, groupCol, idCol, valueCol, reps)
      .withColumn("__s", sort_array(array((1 to reps).map(r => col(s"__e$r")): _*)))
      .select(col(groupCol), col("n"), col("total"),
        element_at(col("__s"), loRank).as("boot_lo"),
        element_at(col("__s"), hiRank).as("boot_hi"))
  }

  /** The weight as a DuckDB CASE over the same declared thresholds;
    * `hExpr` must be the md5-prefix60 of (id || ':' || r).
    */
  def oracleCase(hExpr: String): String = {
    val whens = Thresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $hExpr < $t THEN $k" }.mkString(" ")
    s"CASE $whens ELSE $MaxWeight END"
  }

  /** DuckDB replay of [[replicates]]; `rowsSql` yields (grp, id, x). */
  def replicatesOracle(rowsSql: String, groupName: String, reps: Int): String = {
    val h = "CAST(('0x'||substr(md5(id || ':' || r),1,15)) AS BIGINT)"
    s"""SELECT grp AS $groupName, r AS rep,
  CAST(sum((${oracleCase(h)}) * x) AS BIGINT) AS boot_sum
FROM ($rowsSql), (SELECT unnest(generate_series(1, $reps)) AS r)
WHERE id IS NOT NULL AND x IS NOT NULL
GROUP BY grp, r ORDER BY $groupName, rep"""
  }

  /** DuckDB replay of [[summary]]. */
  def summaryOracle(rowsSql: String, groupName: String, reps: Int,
                    loRank: Int, hiRank: Int): String = {
    val h = "CAST(('0x'||substr(md5(id || ':' || r),1,15)) AS BIGINT)"
    s"""WITH b AS (
  SELECT grp, r, sum((${oracleCase(h)}) * x) AS bs
  FROM ($rowsSql), (SELECT unnest(generate_series(1, $reps)) AS r)
  WHERE id IS NOT NULL AND x IS NOT NULL
  GROUP BY grp, r),
t AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total
  FROM ($rowsSql) WHERE id IS NOT NULL AND x IS NOT NULL GROUP BY grp)
SELECT t.grp AS $groupName, t.n, t.total,
  CAST((list_sort(list(b.bs)))[$loRank] AS BIGINT) AS boot_lo,
  CAST((list_sort(list(b.bs)))[$hiRank] AS BIGINT) AS boot_hi
FROM b JOIN t ON b.grp IS NOT DISTINCT FROM t.grp
GROUP BY t.grp, t.n, t.total ORDER BY $groupName"""
  }
}
