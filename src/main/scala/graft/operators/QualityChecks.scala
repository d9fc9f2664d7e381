package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the deequ/"expectations" shape): a
  * rule set verified in ONE aggregation pass over the table, reported as
  * one row per rule with the observed metric, the bound(s) it was checked
  * against, and the verdict. A 100 TB pipeline runs this between every
  * stage; the design constraints are (1) one scan no matter how many rules,
  * (2) exact integer arithmetic so the report is engine-replayable —
  * fractional thresholds are per-mille cross-multiplied, never divided.
  *
  * All rules melt into the uniform verdict
  * `(bound_lo IS NULL OR metric >= bound_lo) AND (bound_hi IS NULL OR
  * metric <= bound_hi)`:
  *
  *  - `NotNull(c, maxNullPerMille)`: metric = nulls(c)·1000, bound_hi =
  *    maxNullPerMille·rows.
  *  - `Unique(c)`: metric = distinct(c), bound_lo = bound_hi =
  *    non-nulls(c) (exact distinct — Spark's multi-distinct Expand keeps it
  *    one pass).
  *  - `InRange(c, lo, hi, minPerMille)`: metric = rows-in-[lo,hi]·1000,
  *    bound_lo = minPerMille·non-nulls(c).
  *  - `InSet(c, values, minPerMille)`: same with set membership.
  *  - `RowCountBetween(lo, hi)`: metric = rows, bounds literal.
  *
  * Reference anchor: the validation analog of the reference's
  * introspection surface (S13 schema checks) lifted to data contracts —
  * an extension row, no reference counterpart.
  */
object QualityChecks {

  sealed trait Rule
  final case class NotNull(column: String, maxNullPerMille: Int = 0) extends Rule
  final case class Unique(column: String) extends Rule
  final case class InRange(column: String, lo: Double, hi: Double,
                           minPerMille: Int = 1000) extends Rule
  final case class InSet(column: String, values: Seq[String],
                         minPerMille: Int = 1000) extends Rule
  final case class RowCountBetween(lo: Long, hi: Long) extends Rule

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** One row per rule: (rule, column, metric, bound_lo, bound_hi, pass),
    * all metrics from a single aggregation over `df`.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val aggs = scala.collection.mutable.LinkedHashMap[String, Column](
      "__rows" -> count(lit(1)))
    def need(rawKey: String, a: => Column): String = {
      // keys become column names resolved via col(): escape everything but
      // letters/digits so a double-valued bound can't read as a nested-field
      // path. The escape is INJECTIVE ('_' always introduces exactly 4 hex
      // digits, literal '_' included) — two distinct rules can never
      // sanitize to the same key and silently share a counter (e.g.
      // InSet("a|b") vs InSet("a","b")); identical raw keys still dedup
      // into one shared aggregate
      val key = rawKey.flatMap { ch =>
        if (ch.isLetterOrDigit) ch.toString else f"_${ch.toInt}%04x"
      }
      if (!aggs.contains(key)) aggs(key) = a; key
    }
    // one aggregate expression list serving every rule
    val planned: Seq[(Rule, Seq[String])] = rules.map {
      case r @ NotNull(c, _) =>
        r -> Seq(need(s"__nn_$c", count(col(c))))
      case r @ Unique(c) =>
        r -> Seq(need(s"__nd_$c", count_distinct(col(c))), need(s"__nn_$c", count(col(c))))
      case r @ InRange(c, lo, hi, _) =>
        r -> Seq(need(s"__ir_${c}_${lo}_$hi",
            cnt(col(c).isNotNull && col(c) >= lo && col(c) <= hi)),
          need(s"__nn_$c", count(col(c))))
      case r @ InSet(c, vs, _) =>
        // length-prefix each value so the joined key is injective in the set
        // (plain mkString("|") renders {"a|b"} and {"a","b"} identically)
        r -> Seq(need(s"__is_${c}_" + vs.map(v => s"${v.length}~$v").mkString("|"),
            cnt(col(c).isInCollection(vs))), need(s"__nn_$c", count(col(c))))
      case r @ RowCountBetween(_, _) => r -> Seq.empty
    }
    val one = df.agg(aggs.values.head.as(aggs.keys.head),
      aggs.drop(1).map { case (k, a) => a.as(k) }.toSeq: _*)
    val nullL = lit(null).cast("long")
    val melted = planned.map {
      case (NotNull(c, maxPm), keys) => struct(
        lit("not_null").as("rule"), lit(c).as("column"),
        ((col("__rows") - col(keys.head)) * 1000L).as("metric"),
        nullL.as("bound_lo"), (col("__rows") * maxPm).as("bound_hi"))
      case (Unique(c), keys) => struct(
        lit("unique").as("rule"), lit(c).as("column"),
        col(keys.head).cast("long").as("metric"),
        col(keys(1)).as("bound_lo"), col(keys(1)).as("bound_hi"))
      case (InRange(c, _, _, minPm), keys) => struct(
        lit("in_range").as("rule"), lit(c).as("column"),
        (col(keys.head) * 1000L).as("metric"),
        (col(keys(1)) * minPm).as("bound_lo"), nullL.as("bound_hi"))
      case (InSet(c, _, minPm), keys) => struct(
        lit("in_set").as("rule"), lit(c).as("column"),
        (col(keys.head) * 1000L).as("metric"),
        (col(keys(1)) * minPm).as("bound_lo"), nullL.as("bound_hi"))
      case (RowCountBetween(lo, hi), _) => struct(
        lit("row_count").as("rule"), lit("*").as("column"),
        col("__rows").as("metric"), lit(lo).as("bound_lo"), lit(hi).as("bound_hi"))
    }
    one.select(explode(array(melted: _*)).as("r")).select("r.*")
      .withColumn("pass",
        (col("bound_lo").isNull || col("metric") >= col("bound_lo")) &&
          (col("bound_hi").isNull || col("metric") <= col("bound_hi")))
  }

  /** DuckDB oracle: the same integer metrics from one aggregate CTE, one
    * UNION ALL branch per rule, same uniform verdict.
    */
  def oracle(table: String, rules: Seq[Rule]): String = {
    def branch(rule: String, column: String, metric: String,
               lo: String, hi: String): String =
      s"""SELECT '$rule' AS rule, '$column' AS "column", CAST($metric AS BIGINT) AS metric,
CAST($lo AS BIGINT) AS bound_lo, CAST($hi AS BIGINT) AS bound_hi,
(($lo IS NULL OR $metric >= $lo) AND ($hi IS NULL OR $metric <= $hi)) AS pass FROM s"""
    val branches = rules.map {
      case NotNull(c, maxPm) =>
        branch("not_null", c, s"(count(*) - count($c)) * 1000", "NULL", s"count(*) * $maxPm")
      case Unique(c) =>
        branch("unique", c, s"count(DISTINCT $c)", s"count($c)", s"count($c)")
      case InRange(c, lo, hi, minPm) =>
        branch("in_range", c,
          s"count_if($c IS NOT NULL AND $c >= $lo AND $c <= $hi) * 1000",
          s"count($c) * $minPm", "NULL")
      case InSet(c, vs, minPm) =>
        val set = vs.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
        branch("in_set", c, s"count_if($c IN ($set)) * 1000",
          s"count($c) * $minPm", "NULL")
      case RowCountBetween(lo, hi) =>
        branch("row_count", "*", "count(*)", s"$lo", s"$hi")
    }
    s"WITH s AS (SELECT * FROM $table)\n" + branches.mkString("\nUNION ALL\n")
  }
}
