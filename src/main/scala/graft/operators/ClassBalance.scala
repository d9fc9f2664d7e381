package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Class-imbalance audit + balanced reweighting — the step before any
  * training run on labeled data: how skewed are the labels, and what
  * per-class weight rebalances them? The standard "balanced" rule
  * `w_c = N / (k · n_c)` (k = number of classes), published exactly as
  * `weight_e8 = ⌊10⁸·N / (k·n_c)⌋` — a class holding exactly its
  * uniform share weighs 10⁸; rarer weighs more. Non-negative
  * everywhere, so truncating div IS floor on both engines.
  *
  * NULL labels are a real class (an unlabeled row is a label state a
  * sampler must account for). Scale shape: one partial-agg'd groupBy
  * (a whale class collapses map-side), a 1-row broadcast total; output
  * is class-cardinality-sized.
  */
object ClassBalance {

  /** (label, n, share_e8, weight_e8) per distinct label. */
  def balancedWeights(df: DataFrame, labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tot = counts.agg(sum(col("n")).cast(dec).as("__N"),
      count(lit(1)).cast(dec).as("__k"))
    counts.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        expr(s"CAST((CAST(n AS $dec) * 100000000) div __N AS BIGINT)")
          .as("share_e8"),
        expr(s"CAST((__N * 100000000) div (__k * n) AS BIGINT)")
          .as("weight_e8"))
  }

  /** DuckDB replay of [[balancedWeights]]. */
  def oracleSql(table: String, labelSql: String): String =
    s"""WITH c AS (SELECT $labelSql AS label, CAST(count(*) AS HUGEINT) AS n
  FROM $table GROUP BY 1),
t AS (SELECT CAST(sum(n) AS HUGEINT) AS N, CAST(count(*) AS HUGEINT) AS k FROM c)
SELECT c.label, CAST(c.n AS BIGINT) AS n,
  CAST((c.n * 100000000) // t.N AS BIGINT) AS share_e8,
  CAST((t.N * 100000000) // (t.k * c.n) AS BIGINT) AS weight_e8
FROM c CROSS JOIN t ORDER BY c.label""".stripMargin
}
