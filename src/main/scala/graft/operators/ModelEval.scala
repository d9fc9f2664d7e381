package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-output evaluation — the per-class report and the
  * chance-corrected agreement coefficient, both exact. These close the
  * model-eval layer's classification corner (L192 audits labels
  * against neighbors, L213 backtests sequence predictions, [[RocAuc]]
  * scores a ranking; this scores hard class assignments — a
  * router's predicted language vs annotated, an annotator vs another
  * annotator, a heuristic vs ground truth).
  *
  * [[classReport]] — per class c: tp, fp, fn and the quantized
  * precision/recall/F1, each ONE truncating division on non-negative
  * integers (F1 via its tp form, 2tp/(2tp+fp+fn), so it needs no
  * float composition of p and r); support = tp+fn. A class never
  * predicted has NULL precision (0/0 — not a zero); a class never
  * true has NULL recall; F1 NULL only when all three counts are 0
  * (the class appears on neither side — impossible for emitted rows).
  *
  * [[cohensKappa]] — (po − pe)/(1 − pe) cross-multiplied into exact
  * integers: with n total, `agree` the diagonal sum and
  * `chance = Σ_c n_true(c)·n_pred(c)`,
  *
  *   kappa_q6 = sign-split ⌊10⁶·(n·agree − chance)/(n² − chance)⌋
  *
  * (the numerator CAN be negative — worse-than-chance agreement is a
  * real finding — hence the sign split; n² = chance means both sides
  * are the same constant class: agreement is vacuous, kappa NULL).
  * Magnitudes ride DECIMAL(38,0) — n·agree ≤ n² overflows Long past
  * ~3·10⁹ rows.
  *
  * Scale shape: everything derives from the (true, pred) contingency
  * table — ONE partial-agg'd groupBy collapses any corpus to
  * |classes|² counts map-side; the report and kappa are class-sized
  * arithmetic after that. NULL on either side drops the row (an
  * unlabeled or unpredicted row belongs to coverage metrics — L189 —
  * not to agreement).
  */
object ModelEval {

  val Scale = 1000000L

  /** The shared (true, pred, n) contingency collapse. */
  private def cells(df: DataFrame, trueCol: String,
                    predCol: String): DataFrame =
    df.where(col(trueCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(trueCol).as("__t"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)

  /** (class, tp, fp, fn, support, precision_q6, recall_q6, f1_q6) for
    * every class appearing as a true or predicted label.
    */
  def classReport(df: DataFrame, trueCol: String,
                  predCol: String): DataFrame = {
    val c = cells(df, trueCol, predCol)
    val byTrue = c.groupBy(col("__t").as("clazz"))
      .agg(sum(col("__n")).as("__nt"),
        sum(when(col("__t") === col("__p"), col("__n")).otherwise(lit(0L)))
          .as("__tp1"))
    val byPred = c.groupBy(col("__p").as("__cp"))
      .agg(sum(col("__n")).as("__np"))
    def q6(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0L, lit(null).cast("long"))
        .otherwise(call_function("div", num * Scale, den))
    byTrue.join(byPred, col("clazz") === col("__cp"), "full_outer")
      .select(
        coalesce(col("clazz"), col("__cp")).as("clazz"),
        coalesce(col("__tp1"), lit(0L)).as("tp"),
        (coalesce(col("__np"), lit(0L)) - coalesce(col("__tp1"), lit(0L)))
          .as("fp"),
        (coalesce(col("__nt"), lit(0L)) - coalesce(col("__tp1"), lit(0L)))
          .as("fn"))
      .withColumn("support", col("tp") + col("fn"))
      .withColumn("precision_q6", q6(col("tp"), col("tp") + col("fp")))
      .withColumn("recall_q6", q6(col("tp"), col("tp") + col("fn")))
      .withColumn("f1_q6",
        q6(lit(2L) * col("tp"), lit(2L) * col("tp") + col("fp") + col("fn")))
  }

  /** One row: (n, agree, kappa_q6). */
  def cohensKappa(df: DataFrame, trueCol: String,
                  predCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val c = cells(df, trueCol, predCol)
    val n = c.agg(coalesce(sum(col("__n")), lit(0L)).as("__tot"),
      coalesce(sum(when(col("__t") === col("__p"), col("__n"))
        .otherwise(lit(0L))), lit(0L)).as("__agree"))
    val byTrue = c.groupBy(col("__t").as("__c1"))
      .agg(sum(col("__n")).cast(dec).as("__nt"))
    val byPred = c.groupBy(col("__p").as("__c2"))
      .agg(sum(col("__n")).cast(dec).as("__np"))
    val chance = byTrue
      .join(byPred, col("__c1") <=> col("__c2"), "inner")
      .agg(coalesce(sum(col("__nt") * col("__np")), lit(0).cast(dec))
        .as("__chance"))
    val joined = n.crossJoin(broadcast(chance))
    val nD = col("__tot").cast(dec)
    val num = nD * col("__agree").cast(dec) - col("__chance")
    val den = nD * nD - col("__chance")
    joined.select(
      col("__tot").as("n"),
      col("__agree").as("agree"),
      when(den === lit(0).cast(dec), lit(null).cast("long"))
        .otherwise(
          (when(num < 0, lit(-1L)).otherwise(lit(1L)) *
            call_function("div", abs(num) * lit(Scale).cast(dec), den))
            .cast("long"))
        .as("kappa_q6"))
  }

  /** DuckDB replay of [[classReport]]. */
  def classReportOracle(table: String, trueSql: String,
                        predSql: String): String =
    s"""WITH c AS (
  SELECT $trueSql AS t, $predSql AS p, count(*) AS n FROM $table
  WHERE ($trueSql) IS NOT NULL AND ($predSql) IS NOT NULL GROUP BY 1, 2),
bt AS (SELECT t AS clazz, sum(n) AS nt,
    sum(CASE WHEN t = p THEN n ELSE 0 END) AS tp1 FROM c GROUP BY 1),
bp AS (SELECT p AS clazz, sum(n) AS np FROM c GROUP BY 1),
j AS (
  SELECT coalesce(bt.clazz, bp.clazz) AS clazz,
    CAST(coalesce(tp1, 0) AS BIGINT) AS tp,
    CAST(coalesce(np, 0) - coalesce(tp1, 0) AS BIGINT) AS fp,
    CAST(coalesce(nt, 0) - coalesce(tp1, 0) AS BIGINT) AS fn
  FROM bt FULL OUTER JOIN bp ON bt.clazz = bp.clazz)
SELECT clazz, tp, fp, fn, tp + fn AS support,
  CASE WHEN tp + fp = 0 THEN NULL
       ELSE CAST((tp * $Scale) // (tp + fp) AS BIGINT) END AS precision_q6,
  CASE WHEN tp + fn = 0 THEN NULL
       ELSE CAST((tp * $Scale) // (tp + fn) AS BIGINT) END AS recall_q6,
  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
       ELSE CAST((2 * tp * $Scale) // (2 * tp + fp + fn) AS BIGINT)
  END AS f1_q6
FROM j ORDER BY clazz"""

  /** DuckDB replay of [[cohensKappa]] — HUGEINT magnitudes, sign split
    * outside the non-negative `//`.
    */
  def kappaOracleSql(table: String, trueSql: String,
                     predSql: String): String =
    s"""WITH c AS (
  SELECT $trueSql AS t, $predSql AS p, count(*) AS n FROM $table
  WHERE ($trueSql) IS NOT NULL AND ($predSql) IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT CAST(coalesce(sum(n), 0) AS HUGEINT) AS nn,
    CAST(coalesce(sum(CASE WHEN t = p THEN n ELSE 0 END), 0) AS HUGEINT)
      AS agree FROM c),
bt AS (SELECT t AS clazz, CAST(sum(n) AS HUGEINT) AS nt FROM c GROUP BY 1),
bp AS (SELECT p AS clazz, CAST(sum(n) AS HUGEINT) AS np FROM c GROUP BY 1),
ch AS (SELECT CAST(coalesce(sum(nt * np), 0) AS HUGEINT) AS chance
  FROM bt JOIN bp ON bt.clazz = bp.clazz)
SELECT CAST(nn AS BIGINT) AS n, CAST(agree AS BIGINT) AS agree,
  CASE WHEN nn * nn - chance = 0 THEN NULL
       ELSE CAST((CASE WHEN nn * agree - chance < 0 THEN -1 ELSE 1 END)
         * ((abs(nn * agree - chance) * $Scale) // (nn * nn - chance))
         AS BIGINT) END AS kappa_q6
FROM tot, ch"""
}
