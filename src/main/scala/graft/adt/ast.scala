package graft.adt

import graft.core.{FxType, FxValue}

/** Serializable relational query ADT.
  *
  * Capability parity with the reference's query IR
  * (fabrix-sql/src/builder/sql_adt.rs:273-292 columns, :448-547 filter
  * expressions, :680-751 join, :749-752 limit/offset/group_by) re-expressed as
  * proper trees instead of the reference's pairwise marker sequences: a tree is
  * what both Catalyst and a SQL renderer want, and the reference's typestate
  * builder FSM (sql_adt.rs:555-673) exists only to guarantee the well-formedness
  * a tree gives for free. A sequence-style builder ([[FilterBuilder]]) is
  * provided for API parity.
  */

// ---------------------------------------------------------------- columns ---

/** A projected column expression. Nesting beyond the reference's flat
  * fn-of-column surface is deliberate: it lets callers demand exact decimal
  * aggregation (`Cast(Sum(Cast(x, dec)), double)`) which is what a distributed
  * engine needs for run-independent float results.
  */
sealed trait ColumnExpr {
  def as(alias: String): ColumnExpr = Aliased(this, alias)
  /** Output name following SQL rules (alias, else derived). */
  def outputName: String = this match {
    case Col(n, _)       => n
    case Aliased(_, a)   => a
    case Lit(v)          => v.toString
    case Agg(fn, e, d)   => s"${fn.sqlName.toLowerCase}${if (d) "_distinct" else ""}(${e.outputName})"
    case CountStar       => "count_star()"
    case Fn(fn, args)    => s"${fn.sqlName.toLowerCase}(${args.map(_.outputName).mkString(",")})"
    case Cast(e, t)      => e.outputName
    case BinOp(op, l, r) => s"(${l.outputName}${op.symbol}${r.outputName})"
    case WinExpr(_, _)   => "window"
    case _: CaseWhen     => "case"
  }
  /** Whether an aggregate function occurs anywhere in this expression —
    * decides projection-vs-aggregation handling in the translator and
    * renderer (shared here so the two cannot disagree).
    */
  def containsAgg: Boolean = this match {
    case _: Agg | CountStar => true
    case Aliased(x, _)      => x.containsAgg
    case Cast(x, _)         => x.containsAgg
    case Fn(_, args)        => args.exists(_.containsAgg)
    case BinOp(_, l, r)     => l.containsAgg || r.containsAgg
    case CaseWhen(bs, d)    => bs.exists(_._2.containsAgg) || d.exists(_.containsAgg)
    case _                  => false
  }
}

final case class Col(name: String, table: Option[String] = None) extends ColumnExpr
final case class Lit(v: FxValue) extends ColumnExpr
final case class Aliased(e: ColumnExpr, alias: String) extends ColumnExpr
final case class Fn(fn: ScalarFn, args: Seq[ColumnExpr]) extends ColumnExpr
final case class Agg(fn: AggFn, arg: ColumnExpr, distinct: Boolean = false) extends ColumnExpr
case object CountStar extends ColumnExpr
final case class Cast(e: ColumnExpr, to: FxType) extends ColumnExpr
final case class BinOp(op: ArithOp, l: ColumnExpr, r: ColumnExpr) extends ColumnExpr

/** Searched CASE expression (extension — the reference's scalar surface has
  * no conditional). First matching branch wins; no match and no default ⇒
  * NULL, matching ANSI. Reuses the filter [[Expr]] tree for the WHEN
  * predicates so the conditional surface equals the WHERE surface exactly —
  * one predicate language on the wire, in the translator, and in the
  * renderer. Enables conditional aggregation (`SUM(CASE WHEN … THEN x ELSE
  * 0 END)`), the backbone of one-pass pivot-style rollups.
  */
final case class CaseWhen(
    branches: Seq[(Expr, ColumnExpr)],
    default: Option[ColumnExpr] = None) extends ColumnExpr {
  require(branches.nonEmpty, "CASE requires at least one WHEN branch")
}

/** Window-function projection (extension — the reference's IR has no OVER
  * clause). `fn OVER (PARTITION BY … ORDER BY … [ROWS BETWEEN …])`; both the
  * native translator (Spark `Window`) and the SQL renderer consume the same
  * node, so the two paths stay pinned.
  *
  * Ranking functions are typed i64 on OUR surface (Spark's row_number/rank
  * return int, ANSI engines return bigint — the translator widens so results
  * are engine-portable). Determinism at scale demands the usual discipline:
  * a total ORDER BY within each partition (tie-break on a unique key),
  * otherwise rank/lag are partition-layout-dependent.
  */
final case class WinExpr(fn: WindowFn, over: WindowDef) extends ColumnExpr

/** OVER-clause spec. ROWS frames only — RANGE frames need per-type interval
  * semantics that differ across engines; ROWS is what moving windows use.
  */
final case class WindowDef(
    partitionBy: Seq[Col] = Nil,
    orderBy: Seq[Order] = Nil,
    frame: Option[(FrameBound, FrameBound)] = None)

sealed trait FrameBound
object FrameBound {
  case object UnboundedPreceding      extends FrameBound
  final case class Preceding(n: Int)  extends FrameBound
  case object CurrentRow              extends FrameBound
  final case class Following(n: Int)  extends FrameBound
  case object UnboundedFollowing      extends FrameBound
}

sealed trait WindowFn
object WindowFn {
  case object RowNumber                                  extends WindowFn
  case object Rank                                       extends WindowFn
  case object DenseRank                                  extends WindowFn
  final case class Lag(arg: ColumnExpr, offset: Int = 1)  extends WindowFn
  final case class Lead(arg: ColumnExpr, offset: Int = 1) extends WindowFn
  /** Windowed aggregate (moving sum/avg/min/max/count over the frame). */
  final case class WAgg(fn: AggFn, arg: ColumnExpr)      extends WindowFn
  /** n equal-height buckets over the partition order (i64 like the ranks). */
  final case class Ntile(n: Int) extends WindowFn {
    require(n > 0, s"NTILE bucket count must be positive, got $n")
  }
  /** (rank−1)/(rows−1) — exact IEEE division of two ints, engine-portable. */
  case object PercentRank                                extends WindowFn
  case object CumeDist                                   extends WindowFn
  /** First/last value IN THE FRAME — ANSI semantics: with the default
    * frame LAST_VALUE is the current row's value; pass an explicit
    * unbounded-following frame for "last of the partition".
    */
  final case class FirstValue(arg: ColumnExpr)           extends WindowFn
  final case class LastValue(arg: ColumnExpr)            extends WindowFn
}

/** Scalar function surface (sql_adt.rs:218-246: Alias/Abs/IfNull/Cast/
  * Coalesce/CharLength/Lower/Upper; Alias and Cast are structural here).
  */
sealed abstract class ScalarFn(val sqlName: String)
object ScalarFn {
  case object Abs        extends ScalarFn("ABS")
  case object IfNull     extends ScalarFn("COALESCE") // IFNULL(a,b) ≡ COALESCE(a,b)
  case object Coalesce   extends ScalarFn("COALESCE")
  case object CharLength extends ScalarFn("LENGTH")
  case object Lower      extends ScalarFn("LOWER")
  case object Upper      extends ScalarFn("UPPER")
  // extensions beyond the reference's 6-function surface:
  case object Round      extends ScalarFn("ROUND")
  /** SUBSTRING(x, pos, len) — pos/len must be int literals (1-based pos). */
  case object Substring  extends ScalarFn("SUBSTRING")
  case object Trim       extends ScalarFn("TRIM")
  /** Rendered as `(a || b || …)` — the null-propagating ANSI concatenation
    * (Spark `concat` and `||` agree: any NULL operand ⇒ NULL; engines whose
    * CONCAT() skips NULLs would diverge, hence the operator form).
    */
  case object Concat     extends ScalarFn("CONCAT")
  case object Replace    extends ScalarFn("REPLACE")
  /** EXTRACT(field FROM ts) — typed i64 on our surface (Spark's extraction
    * fns return int, ANSI engines BIGINT; the translator widens).
    */
  final case class Extract(field: String) extends ScalarFn("EXTRACT") {
    require(Extract.Fields.contains(field), s"unsupported EXTRACT field: $field")
  }
  object Extract { val Fields: Set[String] = Set("year", "month", "day", "hour", "minute", "second") }
  /** DATE_TRUNC('unit', ts) — timestamp-valued truncation. */
  final case class DateTrunc(unit: String) extends ScalarFn("DATE_TRUNC") {
    require(DateTrunc.Units.contains(unit), s"unsupported DATE_TRUNC unit: $unit")
  }
  object DateTrunc { val Units: Set[String] = Set("year", "quarter", "month", "week", "day", "hour", "minute", "second") }
}

sealed abstract class AggFn(val sqlName: String)
object AggFn {
  case object Max   extends AggFn("MAX")
  case object Min   extends AggFn("MIN")
  case object Sum   extends AggFn("SUM")
  case object Avg   extends AggFn("AVG")
  case object Count extends AggFn("COUNT")
  // extensions beyond the reference surface (SURVEY §2.5 "NOT present"):
  case object Median extends AggFn("MEDIAN")
  /** Exact interpolated quantile (the reference's `quantile(p)`,
    * dispatcher_tests.rs:139-151) — Spark `percentile`, rendered as ANSI
    * `PERCENTILE_CONT(p) WITHIN GROUP (ORDER BY x)`.
    */
  final case class Quantile(p: Double) extends AggFn("PERCENTILE_CONT") {
    require(p >= 0.0 && p <= 1.0, s"quantile p must be in [0,1], got $p")
  }
}

sealed abstract class ArithOp(val symbol: String)
object ArithOp {
  case object Add extends ArithOp("+")
  case object Sub extends ArithOp("-")
  case object Mul extends ArithOp("*")
  case object Div extends ArithOp("/")
}

// ---------------------------------------------------------------- filters ---

/** Filter expression tree (replaces sql_adt.rs:448-547 marker sequences). */
sealed trait Expr {
  def &&(other: Expr): Expr = And(Seq(this, other))
  def ||(other: Expr): Expr = Or(Seq(this, other))
  def unary_! : Expr = Not(this)
}
final case class Cond(column: Col, op: CondOp) extends Expr
final case class And(exprs: Seq[Expr]) extends Expr
final case class Or(exprs: Seq[Expr]) extends Expr
final case class Not(expr: Expr) extends Expr

/** Predicate surface F1-F7 (sql_adt.rs:466-483). */
sealed trait CondOp
object CondOp {
  final case class Equal(v: FxValue)              extends CondOp
  final case class NotEqual(v: FxValue)           extends CondOp
  final case class Greater(v: FxValue)            extends CondOp
  final case class GreaterEqual(v: FxValue)       extends CondOp
  final case class Less(v: FxValue)               extends CondOp
  final case class LessEqual(v: FxValue)          extends CondOp
  final case class In(vs: Seq[FxValue])           extends CondOp
  final case class Between(lo: FxValue, hi: FxValue) extends CondOp
  final case class Like(pattern: String)          extends CondOp
  case object IsNull                              extends CondOp // extension
  case object IsNotNull                           extends CondOp // extension
}

/** Sequence-style filter builder with the same legality rules as the
  * reference's typestate FSM (sql_adt.rs:555-673): terms and conjunctions must
  * alternate, NOT binds to the next term. Produces an [[Expr]] tree.
  */
final class FilterBuilder private (
    private val terms: Vector[Expr],
    private val pendingOr: Vector[Boolean], // conjunction between terms(i) and terms(i+1)
    private val negateNext: Boolean,
    private val expectTerm: Boolean) {

  def simple(column: String, op: CondOp): FilterBuilder = term(Cond(Col(column), op))
  def nest(f: FilterBuilder => FilterBuilder): FilterBuilder =
    term(f(FilterBuilder.empty).build)

  private def term(e0: Expr): FilterBuilder = {
    require(expectTerm, "conjunction (and/or) required before another term")
    val e = if (negateNext) Not(e0) else e0
    new FilterBuilder(terms :+ e, pendingOr, negateNext = false, expectTerm = false)
  }
  def and: FilterBuilder = conj(false)
  def or: FilterBuilder = conj(true)
  private def conj(isOr: Boolean): FilterBuilder = {
    require(!expectTerm, "conjunction must follow a term")
    new FilterBuilder(terms, pendingOr :+ isOr, negateNext = false, expectTerm = true)
  }
  def not: FilterBuilder = {
    require(expectTerm, "NOT must precede a term")
    new FilterBuilder(terms, pendingOr, negateNext = true, expectTerm = true)
  }

  /** Left-to-right fold; explicit nesting controls grouping, matching the
    * reference's rendering walk (bd.rs:228-323).
    */
  def build: Expr = {
    require(terms.nonEmpty && !expectTerm, "filter must end with a term")
    terms.tail.zip(pendingOr).foldLeft(terms.head) {
      case (acc, (t, true))  => Or(Seq(acc, t))
      case (acc, (t, false)) => And(Seq(acc, t))
    }
  }
}
object FilterBuilder {
  def empty: FilterBuilder = new FilterBuilder(Vector.empty, Vector.empty, false, true)
  def simple(column: String, op: CondOp): FilterBuilder = empty.simple(column, op)
  def not: FilterBuilder = empty.not
  def nest(f: FilterBuilder => FilterBuilder): FilterBuilder = empty.nest(f)
}

// ------------------------------------------------------------------ joins ---

/** Join types J1 (sql_adt.rs:680-687) + Spark-native extensions. */
sealed abstract class JoinType(val spark: String, val sql: String)
object JoinType {
  case object Inner extends JoinType("inner", "JOIN")
  case object Left  extends JoinType("left", "LEFT JOIN")
  case object Right extends JoinType("right", "RIGHT JOIN")
  // extensions (SURVEY §2.4 "NOT present" row):
  case object Full  extends JoinType("full", "FULL JOIN")
  case object Cross extends JoinType("cross", "CROSS JOIN")
  case object Semi  extends JoinType("left_semi", "SEMI JOIN")
  case object Anti  extends JoinType("left_anti", "ANTI JOIN")
}

/** Multi-key equi-join (sql_adt.rs:688-736). `on` = (leftCol, rightCol) pairs
  * ANDed together. The reference allows exactly one join per Select
  * (sql_adt.rs:751); ours allows a chain. `as` aliases the joined table
  * (required for self-joins).
  */
final case class Join(
    table: String,
    on: Seq[(String, String)],
    typ: JoinType = JoinType.Inner,
    as: Option[String] = None,
    /** Force a broadcast of the joined (right) table. Catalyst already
      * auto-broadcasts under `autoBroadcastJoinThreshold`, but the threshold
      * is stats-driven — a dimension read through a view/subquery can lose
      * its size estimate and silently fall to sort-merge. The hint pins the
      * plan the way `broadcast(df)` does; use for tables KNOWN small
      * (dimensions), never for facts.
      */
    broadcastHint: Boolean = false,
    /** Join against a derived table instead of a base table (extension):
      * when set, the right side is this Select's result and `table`/`as`
      * name its alias. A SEMI join against an aggregated subselect is the
      * IN-subquery idiom ("customers with ≥N orders").
      */
    subSelect: Option[Select] = None) {
  def name: String = as.getOrElse(table)
}

// ---------------------------------------------------------------- select ----

/** Sort key. `nullsFirst = None` keeps Spark's defaults (ASC → NULLS FIRST,
  * DESC → NULLS LAST); `Some(b)` pins the placement explicitly on both
  * execution paths (dialects without NULLS FIRST/LAST syntax emulate with
  * an IS NULL prefix key).
  */
final case class Order(column: String, desc: Boolean = false,
                       nullsFirst: Option[Boolean] = None) {
  /** Effective placement under Spark defaults. */
  def nullsFirstEffective: Boolean = nullsFirst.getOrElse(!desc)
}
object Order {
  def asc(c: String): Order = Order(c)
  def desc(c: String): Order = Order(c, desc = true)
  def ascNullsLast(c: String): Order = Order(c, desc = false, nullsFirst = Some(false))
  def descNullsFirst(c: String): Order = Order(c, desc = true, nullsFirst = Some(true))
}

/** Multi-dimensional grouping extension (not in the reference — its GROUP BY
  * is plain lists only, query_dml.rs:68-83). Rollup/Cube map to Spark's
  * `rollup`/`cube` and render as ANSI `GROUP BY ROLLUP/CUBE (…)`.
  */
sealed trait GroupingMode
object GroupingMode {
  case object Plain  extends GroupingMode
  case object Rollup extends GroupingMode
  case object Cube   extends GroupingMode
  /** Arbitrary GROUPING SETS — each set lists names from `Select.groupBy`
    * (the union of all sets); keys absent from a set emit NULL subtotal
    * rows, exactly as ROLLUP/CUBE's generalization. Maps to
    * `Dataset.groupingSets` natively and `GROUP BY GROUPING SETS (…)` in
    * SQL.
    */
  final case class Sets(sets: Seq[Seq[String]]) extends GroupingMode {
    require(sets.nonEmpty, "GROUPING SETS requires at least one set")
  }
}

/** The Select IR (sql_adt.rs:744-855).
  *
  * `fromSelect` (extension): a derived table — when set, the query reads
  * FROM the nested Select's result and `table` is that relation's ALIAS
  * (joins/qualified columns reference it as usual). This is what makes
  * two-level aggregation (avg-of-group-sums) expressible in one IR value.
  */
final case class Select(
    table: String,
    columns: Seq[ColumnExpr],
    fromSelect: Option[Select] = None,
    filter: Option[Expr] = None,
    joins: Seq[Join] = Nil,
    groupBy: Seq[Col] = Nil,
    /** Post-aggregation filter (extension — the reference's IR has no
      * HAVING). Conditions reference OUTPUT columns by name (group keys or
      * aggregate aliases); the SQL renderer substitutes each aggregate
      * alias with its defining expression, so the rendered HAVING is plain
      * ANSI (no lateral-alias dialect dependence).
      */
    having: Option[Expr] = None,
    orderBy: Seq[Order] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    distinct: Boolean = false,
    groupingMode: GroupingMode = GroupingMode.Plain) {

  def columnsName: Seq[String] = columns.map(_.outputName)

  def filter(e: Expr): Select = copy(filter = Some(e))
  def having(e: Expr): Select = copy(having = Some(e))
  def join(j: Join): Select = copy(joins = joins :+ j)
  def groupBy(cols: String*): Select = copy(groupBy = cols.map(Col(_)))
  def rollup(cols: String*): Select =
    copy(groupBy = cols.map(Col(_)), groupingMode = GroupingMode.Rollup)
  def cube(cols: String*): Select =
    copy(groupBy = cols.map(Col(_)), groupingMode = GroupingMode.Cube)
  def orderBy(os: Order*): Select = copy(orderBy = os)
  def limit(n: Long): Select = copy(limit = Some(n))
  def offset(n: Long): Select = copy(offset = Some(n))
}

/** Filtered deletion (sql_adt.rs Delete). Native semantics = keep the
  * complement (anti-filter); pushdown semantics = DELETE WHERE.
  */
final case class Delete(table: String, filter: Option[Expr] = None)

// --------------------------------------------------------------- compound ---

/** Set operation combining two Selects (extension — the reference's IR has
  * no compound queries; our Fabrix layer has vconcat/intersect/except as
  * methods, this makes them WIRE-expressible). ANSI semantics: operands
  * combine positionally; UNION/INTERSECT/EXCEPT are distinct, UNION ALL
  * keeps duplicates. `orderBy`/`limit` apply to the combined result.
  */
sealed abstract class SetOp(val sql: String)
object SetOp {
  case object UnionAll  extends SetOp("UNION ALL")
  case object Union     extends SetOp("UNION")
  case object Intersect extends SetOp("INTERSECT")
  case object Except    extends SetOp("EXCEPT")
}

final case class Compound(
    op: SetOp,
    left: Select,
    right: Select,
    orderBy: Seq[Order] = Nil,
    limit: Option[Long] = None)
