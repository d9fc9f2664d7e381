package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Validity-interval conformance audit — the data-quality check every
  * versioned dimension ([[Scd2]]), price history, or contract table
  * needs before anyone trusts an as-of join against it: per key, do the
  * `[valid_from, valid_to)` intervals tile cleanly? Three violation
  * classes, counted per key in the strict (valid_from, seq) order:
  *
  *   - `n_overlaps`: the next version starts BEFORE this one ends — an
  *     as-of lookup in the overlap selects an engine-arbitrary version;
  *   - `n_gaps`: the next version starts AFTER this one ends — facts in
  *     the gap silently drop out of inner temporal joins;
  *   - `n_open_mid`: a NULL (open-ended) valid_to on a NON-last version
  *     — "current" must be unique per key.
  *
  * A clean [[Scd2.build]] output has zero of all three by construction
  * (the audit proves stores that were merged, hand-edited, or imported
  * from external CDC). Output is VIOLATION-SIZED: only keys with at
  * least one violation appear.
  *
  * Scale shape: one per-key lead window (the sessionized posture —
  * spill-backed sort, running state is one lead row) then a partial-
  * agg'd groupBy; a whale key is wall-clock only. NULL keys are a real
  * stratum (window parity both engines).
  */
object IntervalAudit {

  /** (key, n_versions, n_overlaps, n_gaps, n_open_mid) per violating key. */
  def audit(dim: DataFrame, keyCol: String, fromCol: String, toCol: String,
            seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(fromCol), col(seqCol))
    dim
      // NULL seq rows are unrankable (the tiebreak of the version order)
      // and drop — the Debounce/Travel contract; a NULL-seq version left
      // in would order differently across engines on a valid_from tie
      .where(col(fromCol).isNotNull && col(seqCol).isNotNull)
      .withColumn("__nf", lead(col(fromCol), 1).over(w))
      .withColumn("__ov",
        when(col(toCol).isNotNull && col("__nf").isNotNull &&
          col("__nf") < col(toCol), 1L).otherwise(0L))
      .withColumn("__gp",
        when(col(toCol).isNotNull && col("__nf").isNotNull &&
          col("__nf") > col(toCol), 1L).otherwise(0L))
      .withColumn("__om",
        when(col(toCol).isNull && col("__nf").isNotNull, 1L).otherwise(0L))
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_versions"),
        sum(col("__ov")).as("n_overlaps"),
        sum(col("__gp")).as("n_gaps"),
        sum(col("__om")).as("n_open_mid"))
      .where(col("n_overlaps") > 0 || col("n_gaps") > 0 ||
        col("n_open_mid") > 0)
  }

  /** DuckDB replay of [[audit]]. */
  def oracleSql(table: String, keyCol: String, fromCol: String,
                toCol: String, seqCol: String): String =
    s"""WITH v AS (
  SELECT $keyCol AS k, $fromCol AS f, $toCol AS t,
    lead($fromCol) OVER (PARTITION BY $keyCol ORDER BY $fromCol, $seqCol) AS nf
  FROM $table WHERE $fromCol IS NOT NULL AND $seqCol IS NOT NULL),
a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_versions,
    CAST(count(*) FILTER (WHERE t IS NOT NULL AND nf IS NOT NULL AND nf < t) AS BIGINT) AS n_overlaps,
    CAST(count(*) FILTER (WHERE t IS NOT NULL AND nf IS NOT NULL AND nf > t) AS BIGINT) AS n_gaps,
    CAST(count(*) FILTER (WHERE t IS NULL AND nf IS NOT NULL) AS BIGINT) AS n_open_mid
  FROM v GROUP BY k)
SELECT k AS key, n_versions, n_overlaps, n_gaps, n_open_mid
FROM a WHERE n_overlaps > 0 OR n_gaps > 0 OR n_open_mid > 0
ORDER BY key""".stripMargin
}
