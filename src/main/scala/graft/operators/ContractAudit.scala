package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality contract audit — the dbt-test /
  * expectations shape: a table ships with a CONTRACT (these columns are
  * never null, this id is unique, this code matches this pattern, this
  * amount sits in this range, this category comes from this list) and
  * the audit reports violations per rule in one readout — the gate a
  * pipeline runs before publishing a snapshot, and the first thing an
  * on-call reads when a downstream breaks.
  *
  * Cost model: every ROW-LOCAL rule (not-null, range, regex, one-of) is
  * a conditional count in ONE shared aggregate pass — ten rules cost
  * one scan, not ten. `Unique` rules each add one partial-agg'd
  * distinct count (violations = rows − distinct keys — duplicates
  * counted by the extra copies); a whale key collapses map-side.
  * Output: (rule, violations, n_rows) per rule, stable rule order.
  *
  * Semantics pinned cross-engine: range/one-of/regex rules do NOT
  * count NULLs as violations (absence is [[NotNull]]'s job — one
  * violation, one rule); regex is UNANCHORED substring search on both
  * engines (anchor explicitly with ^$ when you mean the whole value).
  */
object ContractAudit {

  sealed trait Rule { def name: String }
  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Non-null `col` must lie in [lo, hi] (integral). */
  final case class InRange(col: String, lo: Long, hi: Long) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null `col` must contain a match of `pattern`. */
  final case class MatchesRegex(col: String, pattern: String) extends Rule {
    // the pattern is part of the identity — two different regexes on one
    // column are distinct rules (r10 review); names land in SQL string
    // literals, so quotes are escaped at render time
    def name = s"matches($col,$pattern)"
  }
  /** Non-null `col` must be one of `values`. */
  final case class OneOf(col: String, values: Seq[String]) extends Rule {
    def name = s"one_of($col,${values.mkString("|")})"
  }
  /** The column tuple must be unique across rows (NULL keys count —
    * two all-NULL keys are duplicates, the SQL-DISTINCT convention).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** (rule, violations, n_rows), one row per rule in declaration order. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name)}")
    val rowLocal = rules.collect {
      case r @ NotNull(c) => r.name -> col(c).isNull
      case r @ InRange(c, lo, hi) =>
        r.name -> (col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case r @ MatchesRegex(c, p) =>
        r.name -> (col(c).isNotNull && !col(c).rlike(p))
      case r @ OneOf(c, vs) =>
        r.name -> (col(c).isNotNull && !col(c).isin(vs.map(lit): _*))
    }
    val base: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        // ONE aggregate row, exploded to (rule, violations) via a map —
        // a per-rule union would re-evaluate (and re-scan) the aggregate
        // once per rule
        val agg = df.agg(count(lit(1)).as("__n"),
          rowLocal.map { case (n, cond) =>
            sum(when(cond, lit(1L)).otherwise(lit(0L))).as(s"__v$n")
          }: _*)
        val pairs = rowLocal.flatMap { case (n, _) =>
          Seq(lit(n), coalesce(col(s"__v$n"), lit(0L))) }
        agg.select(col("__n"), explode(map(pairs: _*)).as(Seq("rule", "violations")))
          .select(col("rule"), col("violations"), col("__n").as("n_rows"))
      }
    // ONE total-count job shared by every Unique rule (each still pays
    // its own distinct count — that part is inherent)
    lazy val totalRows = df.count()
    val uniques = rules.collect { case r @ Unique(cols0) =>
      val distinct = df.select(cols0.map(col): _*).distinct().count()
      df.sparkSession.range(1).select(
        lit(r.name).as("rule"), lit(totalRows - distinct).as("violations"),
        lit(totalRows).as("n_rows"))
    }
    val parts = base.toSeq ++ uniques
    // keep declaration order via a join back on the rule name
    val order = rules.zipWithIndex.map { case (r, i) => (r.name, i) }
    val orderDf = df.sparkSession.createDataFrame(order)
      .toDF("rule", "__ord")
    parts.reduce(_ unionByName _)
      .join(broadcast(orderDf), Seq("rule"))
      .orderBy(col("__ord"))
      .drop("__ord")
  }

  /** DuckDB replay: one sub-select per rule, unioned in declaration
    * order.
    */
  private def q(name: String): String = name.replace("'", "''")

  def oracleSql(table: String, rules: Seq[Rule]): String =
    rules.map {
      case r @ NotNull(c) =>
        s"""SELECT '${q(r.name)}' AS rule,
  CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS violations,
  CAST(count(*) AS BIGINT) AS n_rows FROM $table"""
      case r @ InRange(c, lo, hi) =>
        s"""SELECT '${q(r.name)}' AS rule,
  CAST(count(*) FILTER (WHERE $c IS NOT NULL AND ($c < $lo OR $c > $hi)) AS BIGINT) AS violations,
  CAST(count(*) AS BIGINT) AS n_rows FROM $table"""
      case r @ MatchesRegex(c, p) =>
        s"""SELECT '${q(r.name)}' AS rule,
  CAST(count(*) FILTER (WHERE $c IS NOT NULL AND NOT regexp_matches($c, '$p')) AS BIGINT) AS violations,
  CAST(count(*) AS BIGINT) AS n_rows FROM $table"""
      case r @ OneOf(c, vs) =>
        val list = vs.map(v => s"'$v'").mkString(", ")
        s"""SELECT '${q(r.name)}' AS rule,
  CAST(count(*) FILTER (WHERE $c IS NOT NULL AND $c NOT IN ($list)) AS BIGINT) AS violations,
  CAST(count(*) AS BIGINT) AS n_rows FROM $table"""
      case r @ Unique(cols0) =>
        val keys = cols0.mkString(", ")
        s"""SELECT '${q(r.name)}' AS rule,
  CAST((SELECT count(*) FROM $table) -
       (SELECT count(*) FROM (SELECT DISTINCT $keys FROM $table)) AS BIGINT)
    AS violations,
  CAST((SELECT count(*) FROM $table) AS BIGINT) AS n_rows"""
    }.mkString("\nUNION ALL\n")
}
