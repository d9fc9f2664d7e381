package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ledger audits — the two checks every accounting-shaped dataset runs
  * before anyone trusts a balance: [[runningBalance]] replays each
  * account's postings in order and reports the final and MINIMUM
  * balance plus the first overdraft (the "when did it first go
  * negative" forensic — an account that recovered still failed);
  * [[doubleEntry]] verifies Σ amounts = 0 per transaction (the
  * double-entry invariant) and reports only the violations with their
  * imbalance — an empty result IS the audit passing.
  *
  * Exact semantics: amounts are integral (cents — the repo contract);
  * postings order by (idx, id) with the id tiebreak making same-tick
  * postings deterministic (the TokenBucket convention); duplicate
  * (idx, id) within an account raises in-plan. Overdraft is balance
  * < 0 AFTER a posting; the first is by posting order, not magnitude.
  *
  * Scale shape: one per-account ordered window (running sum + running
  * min share it) + one partial-agg'd collapse — the [[Drawdown]]
  * posture; double-entry is one partial-agg'd sum per transaction.
  */
object Ledger {

  /** (acctCol, n_postings, final_balance, min_balance,
    * first_negative_id) — first_negative_id NULL when never negative.
    */
  def runningBalance(df: DataFrame, acctCol: String, idxCol: String,
                     idCol: String, amountCol: String): DataFrame = {
    Seq(idxCol, idCol, amountCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "runningBalance"))
    val rows = df
      .where(col(idxCol).isNotNull && col(idCol).isNotNull &&
        col(amountCol).isNotNull)
      .select(col(acctCol), col(idxCol).cast("long").as("__i"),
        col(idCol).cast("long").as("__id"),
        col(amountCol).cast("long").as("__a"))
    val order = Window.partitionBy(col(acctCol))
      .orderBy(col("__i"), col("__id"))
    val perKey = Window.partitionBy(col(acctCol), col("__i"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val run = rows
      .withColumn("__dup", count(lit(1)).over(perKey))
      .withColumn("__bal", sum(col("__a"))
        .over(order.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val agg = run.groupBy(col(acctCol))
      .agg(count(lit(1)).as("n_postings"),
        max(col("__dup")).as("__anyDup"),
        sum(col("__a")).as("final_balance"),
        min(col("__bal")).as("min_balance"),
        min(when(col("__bal") < 0L,
          struct(col("__i"), col("__id")))).as("__firstNeg"))
    def guarded(out: org.apache.spark.sql.Column) =
      when(col("__anyDup") > 1L, raise_error(concat(
        lit("runningBalance: duplicate (idx, id) within account '"),
        col(acctCol).cast("string"),
        lit("' — the posting order must be total"))).cast("long"))
        .otherwise(out)
    agg.select(col(acctCol), guarded(col("n_postings")).as("n_postings"),
      guarded(col("final_balance")).as("final_balance"),
      guarded(col("min_balance")).as("min_balance"),
      guarded(col("__firstNeg.__id")).as("first_negative_id"))
  }

  /** Violations only: (txnCol, n_legs, imbalance) where Σ ≠ 0. */
  def doubleEntry(df: DataFrame, txnCol: String,
                  amountCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, amountCol, "doubleEntry")
    df.where(col(txnCol).isNotNull && col(amountCol).isNotNull)
      .groupBy(col(txnCol))
      .agg(count(lit(1)).as("n_legs"),
        sum(col(amountCol).cast("long")).as("imbalance"))
      .where(col("imbalance") =!= 0L)
  }

  /** DuckDB replay of [[runningBalance]]; `rowsSql` yields
    * (acct, i, id, a).
    */
  def runningBalanceOracle(rowsSql: String, acctName: String): String =
    s"""WITH run AS (
  SELECT acct, i, id, a,
    sum(a) OVER (PARTITION BY acct ORDER BY i, id
      ROWS UNBOUNDED PRECEDING) AS bal
  FROM ($rowsSql)
  WHERE i IS NOT NULL AND id IS NOT NULL AND a IS NOT NULL)
SELECT acct AS $acctName, CAST(count(*) AS BIGINT) AS n_postings,
  CAST(sum(a) AS BIGINT) AS final_balance,
  CAST(min(bal) AS BIGINT) AS min_balance,
  (min(CASE WHEN bal < 0 THEN {'i': i, 'id': id} END)).id
    AS first_negative_id
FROM run GROUP BY acct ORDER BY acct"""

  /** DuckDB replay of [[doubleEntry]]; `rowsSql` yields (txn, a). */
  def doubleEntryOracle(rowsSql: String, txnName: String): String =
    s"""SELECT txn AS $txnName, CAST(count(*) AS BIGINT) AS n_legs,
  CAST(sum(a) AS BIGINT) AS imbalance
FROM ($rowsSql) WHERE txn IS NOT NULL AND a IS NOT NULL
GROUP BY txn HAVING sum(a) <> 0 ORDER BY txn"""
}
