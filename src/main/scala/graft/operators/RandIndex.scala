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
}
