package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between two categorical snapshots — the
  * drift member you reach for when [[Drift]]'s PSI can't serve:
  * PSI's per-bucket (p−q)·ln(p/q) is UNBOUNDED and undefined wherever
  * a side is empty (new categories appear in real drift constantly);
  * JSD = ½KL(P‖M) + ½KL(Q‖M) with M the midpoint is SYMMETRIC,
  * BOUNDED by ln 2, and zero-safe (a category absent from one side
  * contributes exactly ½q·ln 2 — finite, the honest "new category"
  * signal).
  *
  * Exactness ladder: per-category contribution
  * ⌊10⁶·½·(p·ln(p/m) + q·ln(q/m))⌋ — the [[Profiling.columnEntropy]]
  * single-double-chain discipline (one ratio, one ln, one floor per
  * term; both engines evaluate the identical chain) — published
  * PER CATEGORY with the raw counts beside it, so the gate hashes and
  * the reader sees WHICH categories drove the drift (the metric-bridge
  * reading); Σ contrib is the reader's total. NULL category values are
  * excluded (absence is a NotNull audit's job, the PSI convention).
  *
  * Scale shape: two partial-agg'd category-count collapses, a
  * value-sized full-outer merge, totals on 1-row broadcasts — never a
  * second corpus pass.
  */
object Jsd {

  val Scale = 1000000L

  /** (value, n_ref, n_cur, jsd_contrib_q6) for every category present
    * on either side. Empty sides raise at once (a divergence against
    * an empty snapshot is a pipeline bug, not drift).
    */
  def jsdCategorical(ref: DataFrame, cur: DataFrame,
                     valueCol: String): DataFrame = {
    def side(df: DataFrame, out: String) =
      df.where(col(valueCol).isNotNull)
        .groupBy(col(valueCol).cast("string").as("__v"))
        .agg(count(lit(1)).as(out))
    val r = side(ref, "n_ref")
    val c = side(cur, "n_cur").withColumnRenamed("__v", "__vc")
    val merged = r.join(c, col("__v") <=> col("__vc"), "full_outer")
      .select(coalesce(col("__v"), col("__vc")).as("value"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      // persist spans the totals and contribution jobs so the two
      // category collapses scan the sources once; ContextCleaner
      // reclaims the blocks when the frame goes out of scope (the
      // columnEntropy device — not a leak, r10 review note)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = merged.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val guarded = totals.select(
      when(col("__tr") === 0L || col("__tc") === 0L,
        raise_error(lit("jsdCategorical: an empty snapshot is a " +
          "pipeline bug, not drift")).cast("long"))
        .otherwise(col("__tr")).as("__tr"), col("__tc"))
    val p = col("n_ref").cast("double") / col("__tr").cast("double")
    val q = col("n_cur").cast("double") / col("__tc").cast("double")
    val m = (p + q) / 2.0
    val term =
      when(col("n_ref") > 0L, p * log(p / m)).otherwise(lit(0.0)) +
        when(col("n_cur") > 0L, q * log(q / m)).otherwise(lit(0.0))
    merged.crossJoin(broadcast(guarded))
      .select(col("value"), col("n_ref"), col("n_cur"),
        floor(lit(Scale / 2.0) * term).cast("long").as("jsd_contrib_q6"))
  }

  /** DuckDB replay — the same chain, same floor, same CASE splits.
    * `refSql`/`curSql` each yield a `v` column.
    */
  def oracleSql(refSql: String, curSql: String): String =
    s"""WITH r AS (SELECT CAST(v AS VARCHAR) AS v, count(*) AS n_ref
  FROM ($refSql) WHERE v IS NOT NULL GROUP BY 1),
c AS (SELECT CAST(v AS VARCHAR) AS v, count(*) AS n_cur
  FROM ($curSql) WHERE v IS NOT NULL GROUP BY 1),
m AS (SELECT coalesce(r.v, c.v) AS value,
    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
  FROM r FULL OUTER JOIN c ON r.v = c.v),
t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
    CAST(sum(n_cur) AS DOUBLE) AS tc FROM m)
SELECT value, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
  CAST(floor(${Scale / 2.0} * (
    CASE WHEN n_ref > 0 THEN (n_ref / tr) * ln((n_ref / tr) /
      ((n_ref / tr + n_cur / tc) / 2.0)) ELSE 0.0 END +
    CASE WHEN n_cur > 0 THEN (n_cur / tc) * ln((n_cur / tc) /
      ((n_ref / tr + n_cur / tc) / 2.0)) ELSE 0.0 END)) AS BIGINT)
    AS jsd_contrib_q6
FROM m, t ORDER BY value"""
}
