package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit and suppression over quasi-identifier columns — the
  * privacy screen a dataset runs before release or training: a
  * quasi-identifier combination shared by fewer than k rows re-identifies
  * its members (Sweeney 2002); the audit lists those combinations, the
  * suppression drops their rows.
  *
  * Null contract: NULL is a quasi-identifier VALUE (groupBy treats NULLs
  * as equal) — "(country=NULL, zip=12345)" is its own cohort, because a
  * missing field narrows identity exactly like a present one.
  *
  * Scale shape: the audit is ONE partial-agg'd groupBy on the
  * quasi-identifier tuple (whale cohorts collapse map-side); suppression
  * anti-joins the rows once against the violation list. The violation
  * list is NOT inherently small — a mostly-unique quasi-identifier tuple
  * (the typical failing dataset) makes nearly every cohort a violation,
  * so the join is left to Catalyst/AQE: it broadcasts when the list fits
  * and shuffles when it doesn't. No window, no second corpus pass.
  */
object Anonymity {

  /** Under-k cohorts: one row per quasi-identifier combination with fewer
    * than `k` members — (quasi cols..., n). Empty result = k-anonymous.
    */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** Rows whose quasi-identifier cohort has at least `k` members — the
    * released dataset. Implemented as a null-safe anti-join against the
    * under-k cohort list so NULL-valued cohorts suppress correctly too.
    * No broadcast hint: the violation list can approach corpus size on a
    * mostly-unique tuple, so the strategy choice stays with AQE.
    */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val bad = audit(df, quasiCols, k).drop("n")
    df.join(bad,
      quasiCols.map(c => df(c) <=> bad(c)).reduce(_ && _), "left_anti")
  }

  /** DuckDB replay of [[audit]]. */
  def auditOracleSql(table: String, quasiCols: Seq[String], k: Long): String = {
    val g = quasiCols.mkString(", ")
    s"SELECT $g, count(*) AS n FROM $table GROUP BY $g HAVING count(*) < $k ORDER BY $g"
  }

  /** DuckDB replay of [[suppress]] — the window form. */
  def suppressOracleSql(table: String, quasiCols: Seq[String], k: Long,
                        keepCols: Seq[String]): String = {
    val g = quasiCols.mkString(", ")
    val cols = keepCols.mkString(", ")
    s"""SELECT $cols FROM (
  SELECT *, count(*) OVER (PARTITION BY $g) AS __n FROM $table)
WHERE __n >= $k ORDER BY $cols""".stripMargin
  }
}
