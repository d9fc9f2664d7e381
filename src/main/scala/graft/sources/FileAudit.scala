package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-layout audit — the small-files check run before anyone scales a
  * table: a 100 TB dataset in 4 KB files dies in task scheduling and
  * footer reads long before compute matters, and a single 100 TB file
  * can't parallelize past its row groups. [[rowsPerFile]] attributes
  * every row of an already-loaded DataFrame to its physical input file
  * via `input_file_name()` (scan-stage, zero extra I/O — the attribution
  * rides the scan that was happening anyway); [[summary]] collapses to
  * the one-row verdict (file count, min/max/avg rows per file) whose
  * skew IS the small-files/giant-file finding.
  *
  * Paths publish as BASENAMES (the `[^/]+$` tail) — stable across
  * `file:/` vs plain-path URI schemes and across engines, so the audit
  * hash-gates. Rows that reach the DataFrame outside a file scan (a
  * joined literal, a cached exchange) carry an empty file name and
  * group under `""` — visible, not dropped.
  *
  * Scale shape: one partial-agg'd collapse keyed by file name —
  * file-count-sized output, never row-sized.
  */
object FileAudit {

  /** One row per input file: (file, n_rows). Grouping keys the FULL
    * path (partitionBy layouts reuse one task's basename in every
    * partition dir — basenames are labels, not identities); the
    * published column is still the basename.
    */
  def rowsPerFile(df: DataFrame): DataFrame =
    df.groupBy(input_file_name().as("__path"))
      .agg(count(lit(1)).as("n_rows"))
      .select(regexp_extract(col("__path"), "[^/]+$", 0).as("file"),
        col("n_rows"))

  /** One row: (n_files, n_rows, min_rows, max_rows, avg_rows). */
  def summary(df: DataFrame): DataFrame =
    rowsPerFile(df).agg(
      count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
      min(col("n_rows")).as("min_rows"), max(col("n_rows")).as("max_rows"),
      call_function("div", sum(col("n_rows")), count(lit(1))).as("avg_rows"))
}
