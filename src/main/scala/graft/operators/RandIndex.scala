package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adjusted Rand index — pair-counting agreement between two labelings
  * of the same rows, the clustering analog of [[ModelEval.cohensKappa]]
  * (kappa scores two CLASSIFIERS against aligned classes; ARI scores two
  * PARTITIONS whose label names mean nothing): the readout for judging
  * a dedup clustering against a reference, comparing MinHash vs SimHash
  * cluster assignments, or checking how well an automatic grouping
  * recovers a known stratification. Chance-corrected: 0 ≈ random
  * agreement, 1 = identical partitions, negative = worse than chance.
  *
  * All evidence is exact pair counting off the label contingency cells
  * (ONE partial-agg'd shuffle — the [[Contingency]] move, margins
  * re-aggregated from the cell table):
  *   same_both = Σ_ij C(n_ij, 2), same_a = Σ_i C(a_i, 2),
  *   same_b = Σ_j C(b_j, 2), n_pairs = C(n, 2)
  * — published as exact DECIMAL-safe integers (the gate-grade numbers;
  * n² outgrows Long at ~10⁹ rows). The float
  * ari = (same_both − E) / ((same_a + same_b)/2 − E) with
  * E = same_a·same_b/n_pairs rides along spec-covered (a division chain
  * never hash-gates — the Spearman precedent).
  *
  * NULL in either label drops the row (an unlabeled row belongs to no
  * pair); identical-partitions degeneracy (denominator 0) reports ARI 1
  * by convention, pinned in spec.
  */
object RandIndex {

  /** One row: (n, same_both, same_a, same_b, n_pairs, ari). */
  def adjustedRand(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def pairs2(c: Column): Column =
      (c.cast(dec) * (c - 1).cast(dec)) / 2
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val base = cells.agg(
      sum(col("__c")).as("__n"),
      sum(pairs2(col("__c"))).cast(dec).as("__sc"))
    val sa = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ca"))
      .agg(sum(pairs2(col("__ca"))).cast(dec).as("__sa"))
    val sb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
      .agg(sum(pairs2(col("__cb"))).cast(dec).as("__sb"))
    val joined = base.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
    val nPairs = pairs2(col("__n"))
    val e = col("__sa").cast("double") * col("__sb").cast("double") /
      nPairs.cast("double")
    val den = (col("__sa").cast("double") + col("__sb").cast("double")) / 2.0 - e
    val ari = when(den === 0.0, lit(1.0))
      .otherwise((col("__sc").cast("double") - e) / den)
    joined.select(
      col("__n").as("n"),
      col("__sc").cast("long").as("same_both"),
      col("__sa").cast("long").as("same_a"),
      col("__sb").cast("long").as("same_b"),
      nPairs.cast("long").as("n_pairs"),
      ari.as("ari"))
  }

  /** DuckDB replay of the exact counts (the float ari stays spec-side). */
  def oracleSql(table: String, aSql: String, bSql: String): String =
    s"""WITH cells AS (
  SELECT $aSql AS a, $bSql AS b, CAST(count(*) AS HUGEINT) AS c
  FROM $table WHERE ($aSql) IS NOT NULL AND ($bSql) IS NOT NULL
  GROUP BY 1, 2),
base AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
    sum(c * (c - 1) / 2) AS sc FROM cells),
ma AS (SELECT sum(ca * (ca - 1) / 2) AS sa
  FROM (SELECT a, sum(c) AS ca FROM cells GROUP BY a)),
mb AS (SELECT sum(cb * (cb - 1) / 2) AS sb
  FROM (SELECT b, sum(c) AS cb FROM cells GROUP BY b))
SELECT CAST(n AS BIGINT) AS n, CAST(sc AS BIGINT) AS same_both,
  CAST(sa AS BIGINT) AS same_a, CAST(sb AS BIGINT) AS same_b,
  CAST(n * (n - 1) / 2 AS BIGINT) AS n_pairs
FROM base, ma, mb"""

  /** B-cubed precision/recall — the clustering-quality pair the dedup
    * literature actually reports (Amigó et al.'s winner among clustering
    * metrics for extrinsic evaluation): per ITEM, precision = the share
    * of its system cluster that shares its gold cluster, recall = the
    * share of its gold cluster its system cluster captures — averaged
    * over items. Where [[adjustedRand]] counts PAIRS (one number,
    * chance-corrected), B-cubed separates the two failure modes: low
    * precision = over-merging (a dedup cluster glued unrelated docs),
    * low recall = over-splitting (one true duplicate group shattered).
    *
    * Cell algebra: Σ_items |cell|/|sys| = Σ_cells n_sg²/n_s (recall the
    * gold analog), so both ride the SAME one-shuffle contingency cells
    * as ARI; published as per-cell-floored quantized sums
    * `⌊10⁶·n_sg²/(n_s·N)⌋` (floors sum exactly — gate-grade), products
    * in DECIMAL(38,0). The float F1 is one trivial division for the
    * reader and rides spec-side (the Spearman precedent).
    */
  def bCubed(df: DataFrame, sysCol: String, goldCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .where(col(sysCol).isNotNull && col(goldCol).isNotNull)
      .groupBy(col(sysCol).as("__s"), col(goldCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val sysSz = cells.groupBy(col("__s")).agg(sum(col("__c")).as("__ns"))
    val goldSz = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__ng"))
    val tot = cells.agg(sum(col("__c")).as("__n"),
      count(lit(1)).as("n_cells"),
      countDistinct(col("__s")).as("n_sys"),
      countDistinct(col("__g")).as("n_gold"))
    val c2 = (col("__c").cast(dec) * col("__c").cast(dec)).cast(dec)
    val scale = lit(1000000L).cast(dec)
    cells
      .join(broadcast(sysSz), "__s")
      .join(broadcast(goldSz), "__g")
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("n_cells"), col("n_sys"), col("n_gold"),
        call_function("div", (scale * c2).cast(dec),
          (col("__ns").cast(dec) * col("__n").cast(dec)).cast(dec))
          .cast("long").as("__pt"),
        call_function("div", (scale * c2).cast(dec),
          (col("__ng").cast(dec) * col("__n").cast(dec)).cast(dec))
          .cast("long").as("__rt"))
      .groupBy(col("__n").as("n"), col("n_cells"), col("n_sys"), col("n_gold"))
      .agg(sum(col("__pt")).as("bcubed_prec_q6"),
        sum(col("__rt")).as("bcubed_rec_q6"))
  }

  /** DuckDB replay of [[bCubed]] — same cells, margins, per-cell floors. */
  def bCubedOracle(table: String, sysCol: String, goldCol: String): String =
    s"""WITH cc AS (SELECT $sysCol AS s, $goldCol AS g,
    CAST(count(*) AS HUGEINT) AS c
  FROM $table WHERE $sysCol IS NOT NULL AND $goldCol IS NOT NULL
  GROUP BY $sysCol, $goldCol),
ss AS (SELECT s, sum(c) AS ns FROM cc GROUP BY s),
gs AS (SELECT g, sum(c) AS ng FROM cc GROUP BY g),
t AS (SELECT sum(c) AS n, CAST(count(*) AS BIGINT) AS n_cells,
    CAST(count(DISTINCT s) AS BIGINT) AS n_sys,
    CAST(count(DISTINCT g) AS BIGINT) AS n_gold FROM cc)
SELECT CAST(t.n AS BIGINT) AS n, t.n_cells, t.n_sys, t.n_gold,
  CAST(sum((1000000 * cc.c * cc.c) // (ss.ns * t.n)) AS BIGINT)
    AS bcubed_prec_q6,
  CAST(sum((1000000 * cc.c * cc.c) // (gs.ng * t.n)) AS BIGINT)
    AS bcubed_rec_q6
FROM cc JOIN ss ON cc.s = ss.s JOIN gs ON cc.g = gs.g CROSS JOIN t
GROUP BY t.n, t.n_cells, t.n_sys, t.n_gold"""
}
