package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitemporal as-of reads — two time axes at once: [[Scd2]] tracks ONE
  * (when a fact was true); an auditable store also needs WHEN WE
  * RECORDED IT, because corrections arrive late ("what did we believe
  * on Jan 5 about the customer's June address?" is a different question
  * from "where did they live in June?"). Each log row asserts
  * (key, [valid_from, valid_to), payload) recorded at tx_ts; later
  * transactions about the same key supersede earlier ones wherever
  * their validity overlaps.
  *
  * [[asOf]] answers the canonical point query — AS OF transaction time
  * T, VALID AT time V: filter tx ≤ T (what we knew by T) and
  * vf ≤ V < vt (assertions covering V), then per key the LATEST
  * transaction wins (tiebreak (tx, vf, vt) — deterministic, never
  * engine-arbitrary). One filter + one per-key rank window; no joins.
  * Re-running with a later T is how an audit explains a changed report:
  * same V, different knowledge.
  *
  * Contracts: NULL key/vf/vt/tx rows drop; vt ≤ vf rows are empty
  * assertions and drop; keys with no assertion covering (T, V) are
  * absent (a bitemporal miss, not a NULL row).
  */
object Bitemporal {

  /** (keyCol, valid_from, valid_to, tx_ts, payloadCols*) — at most one
    * row per key.
    */
  def asOf(log: DataFrame, keyCol: String, vfCol: String, vtCol: String,
           txCol: String, payloadCols: Seq[String],
           txAsOf: String, validAt: String): DataFrame = {
    val vA = lit(validAt).cast("date")
    val tA = lit(txAsOf).cast("date")
    val vf = col(vfCol).cast("date"); val vt = col(vtCol).cast("date")
    val tx = col(txCol).cast("date")
    val cand = log
      .where(col(keyCol).isNotNull && vf.isNotNull && vt.isNotNull &&
        tx.isNotNull && vt > vf &&
        tx <= tA && vf <= vA && vA < vt)
      .select((col(keyCol) +: vf.as("valid_from") +: vt.as("valid_to") +:
        tx.as("tx_ts") +: payloadCols.map(col)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("tx_ts").desc, col("valid_from").desc,
        col("valid_to").asc)
    cand.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .drop("__rk")
  }

  /** DuckDB replay of [[asOf]]; `logSql` must yield
    * (key, vf, vt, tx, payload columns named as in `payloadCols`).
    */
  def oracleSql(logSql: String, keyCol: String, payloadCols: Seq[String],
                txAsOf: String, validAt: String): String = {
    val pay = payloadCols.mkString(", ")
    s"""WITH c AS (
  SELECT $keyCol, CAST(vf AS DATE) AS valid_from,
    CAST(vt AS DATE) AS valid_to, CAST(tx AS DATE) AS tx_ts, $pay
  FROM ($logSql)
  WHERE $keyCol IS NOT NULL AND vf IS NOT NULL AND vt IS NOT NULL
    AND tx IS NOT NULL AND CAST(vt AS DATE) > CAST(vf AS DATE)
    AND CAST(tx AS DATE) <= DATE '$txAsOf'
    AND CAST(vf AS DATE) <= DATE '$validAt'
    AND DATE '$validAt' < CAST(vt AS DATE)),
r AS (SELECT c.*, row_number() OVER (PARTITION BY $keyCol
    ORDER BY tx_ts DESC, valid_from DESC, valid_to ASC) AS rk
  FROM c)
SELECT $keyCol, valid_from, valid_to, tx_ts, $pay
FROM r WHERE rk = 1 ORDER BY $keyCol"""
  }
}
