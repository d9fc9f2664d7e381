package graft.exec

import graft.adt._
import graft.core._

/** Pushdown execution path: renders the query ADT to ANSI SQL. Mirrors the
  * reference's sea-query rendering (fabrix-sql/src/builder/query_dml.rs:31-86,
  * bd.rs:228-435) but targets one ANSI dialect that MySQL/Postgres/SQLite/
  * DuckDB all accept for the SELECT surface. Also used to generate the DuckDB
  * oracle SQL for the driver's differential correctness gate, which keeps the
  * native path (Translator) and the SQL path semantically pinned to each other.
  */
object SqlRenderer {

  def value(v: FxValue): String = v match {
    case FxNull            => "NULL"
    case FxBool(b)         => if (b) "TRUE" else "FALSE"
    case FxI8(x)           => x.toString
    case FxI16(x)          => x.toString
    case FxI32(x)          => x.toString
    case FxI64(x)          => x.toString
    case FxU8(x)           => x.toString
    case FxU16(x)          => x.toString
    case FxU32(x)          => x.toString
    case FxU64(x)          => x.toString
    case FxF32(x)          => x.toString
    case FxF64(x)          => x.toString
    case FxString(x)       => "'" + x.replace("'", "''") + "'"
    case FxDate(days)      => s"DATE '${java.time.LocalDate.ofEpochDay(days.toLong)}'"
    case FxTime(nanos)     => nanos.toString
    case FxDateTime(nanos) =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(nanos, 1000000000L), Math.floorMod(nanos, 1000000000L).toInt,
        java.time.ZoneOffset.UTC)
      val base = ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val frac = if (ldt.getNano == 0) "" else f".${ldt.getNano}%09d".reverse.dropWhile(_ == '0').reverse
      s"TIMESTAMP '$base$frac'"
    case FxDecimal(x)      => x.underlying.toPlainString
    case FxUuid(x)         => s"'$x'"
    case FxBytes(_)        => throw new IllegalArgumentException("bytes literal not renderable to SQL")
  }

  /** ANSI identifier quoting (DuckDB/Postgres/SQLite-compatible); identifiers
    * may come from untrusted file headers, so every rendered reference is
    * quoted (ADVICE r1: never interpolate raw).
    */
  def ident(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  def columnRef(c: Col): String =
    c.table.map(t => s"${ident(t)}.${ident(c.name)}").getOrElse(ident(c.name))

  def columnExpr(e: ColumnExpr): String = e match {
    case c: Col          => columnRef(c)
    case CaseWhen(bs, d) =>
      val branches = bs.map { case (p, v) => s"WHEN ${predicate(p)} THEN ${columnExpr(v)}" }
      val dflt = d.map(v => s" ELSE ${columnExpr(v)}").getOrElse("")
      s"CASE ${branches.mkString(" ")}$dflt END"
    case Lit(v)          => value(v)
    case Aliased(x, a)   => s"${columnExpr(x)} AS ${ident(a)}"
    case Cast(x, t)      => s"CAST(${columnExpr(x)} AS ${t.sqlName})"
    case CountStar       => "COUNT(*)"
    case BinOp(op, l, r) => s"(${columnExpr(l)} ${op.symbol} ${columnExpr(r)})"
    case Fn(ScalarFn.Concat, args) =>
      // operator form: null-propagating on every engine (CONCAT() is not)
      s"(${args.map(columnExpr).mkString(" || ")})"
    case Fn(ScalarFn.Extract(f), args) =>
      s"CAST(EXTRACT(${f.toUpperCase} FROM ${columnExpr(args.head)}) AS BIGINT)"
    case Fn(ScalarFn.DateTrunc(u), args) =>
      // CAST normalizes engines that return DATE for day-or-coarser units
      // (DuckDB) to the timestamp type Spark's date_trunc always yields
      s"CAST(DATE_TRUNC('$u', ${columnExpr(args.head)}) AS TIMESTAMP)"
    case Fn(fn, args)    => s"${fn.sqlName}(${args.map(columnExpr).mkString(", ")})"
    case Agg(AggFn.Quantile(p), arg, _) =>
      s"PERCENTILE_CONT($p) WITHIN GROUP (ORDER BY ${columnExpr(arg)})"
    case Agg(fn, arg, distinct) =>
      val d = if (distinct) "DISTINCT " else ""
      s"${fn.sqlName}($d${columnExpr(arg)})"
    case WinExpr(fn, over) =>
      val inner = fn match {
        case WindowFn.RowNumber  => "row_number()"
        case WindowFn.Rank       => "rank()"
        case WindowFn.DenseRank  => "dense_rank()"
        case WindowFn.Lag(a, n)  => s"lag(${columnExpr(a)}, $n)"
        case WindowFn.Lead(a, n) => s"lead(${columnExpr(a)}, $n)"
        case WindowFn.WAgg(f, a) => s"${f.sqlName}(${columnExpr(a)})"
        case WindowFn.Ntile(n)      => s"ntile($n)"
        case WindowFn.PercentRank   => "percent_rank()"
        case WindowFn.CumeDist      => "cume_dist()"
        case WindowFn.FirstValue(a) => s"first_value(${columnExpr(a)})"
        case WindowFn.LastValue(a)  => s"last_value(${columnExpr(a)})"
      }
      def bound(b: FrameBound): String = b match {
        case FrameBound.UnboundedPreceding => "UNBOUNDED PRECEDING"
        case FrameBound.Preceding(n)       => s"$n PRECEDING"
        case FrameBound.CurrentRow         => "CURRENT ROW"
        case FrameBound.Following(n)       => s"$n FOLLOWING"
        case FrameBound.UnboundedFollowing => "UNBOUNDED FOLLOWING"
      }
      val parts = Seq(
        if (over.partitionBy.nonEmpty)
          Some("PARTITION BY " + over.partitionBy.map(columnRef).mkString(", "))
        else None,
        if (over.orderBy.nonEmpty)
          // explicit null placement: Spark defaults unless the Order pins it
          Some("ORDER BY " + over.orderBy.map(o =>
            ident(o.column) + (if (o.desc) " DESC" else "") +
              (if (o.nullsFirstEffective) " NULLS FIRST" else " NULLS LAST")).mkString(", "))
        else None,
        over.frame.map { case (lo, hi) => s"ROWS BETWEEN ${bound(lo)} AND ${bound(hi)}" }
      ).flatten
      s"$inner OVER (${parts.mkString(" ")})"
  }

  def predicate(e: Expr): String = predicate(e, columnRef)

  /** Predicate rendering with a pluggable column resolver — HAVING uses it
    * to substitute aggregate aliases with their defining expressions.
    */
  private def predicate(e: Expr, resolveCol: Col => String): String = {
    def wrap(x: Expr): String = x match {
      case _: Cond => predicate(x, resolveCol)
      case _       => s"(${predicate(x, resolveCol)})"
    }
    e match {
      case And(es) => es.map(wrap).mkString(" AND ")
      case Or(es)  => es.map(wrap).mkString(" OR ")
      case Not(x)  => s"NOT ${wrap(x)}"
      case Cond(c, op) =>
        val n = resolveCol(c)
        op match {
          case CondOp.Equal(v)        => s"$n = ${value(v)}"
          case CondOp.NotEqual(v)     => s"$n <> ${value(v)}"
          case CondOp.Greater(v)      => s"$n > ${value(v)}"
          case CondOp.GreaterEqual(v) => s"$n >= ${value(v)}"
          case CondOp.Less(v)         => s"$n < ${value(v)}"
          case CondOp.LessEqual(v)    => s"$n <= ${value(v)}"
          case CondOp.In(vs)          => s"$n IN (${vs.map(value).mkString(", ")})"
          case CondOp.Between(lo, hi) => s"$n BETWEEN ${value(lo)} AND ${value(hi)}"
          case CondOp.Like(p)         => s"$n LIKE '${p.replace("'", "''")}'"
          case CondOp.IsNull          => s"$n IS NULL"
          case CondOp.IsNotNull       => s"$n IS NOT NULL"
        }
    }
  }

  /** ANSI/DuckDB rendering (LIMIT n OFFSET n). */
  def select(sel: Select): String =
    selectBase(sel, graft.sources.Dialect.Ansi) +
      sel.limit.map(n => s" LIMIT $n").getOrElse("") +
      sel.offset.map(n => s" OFFSET $n").getOrElse("")

  /** Dialect-specific rendering (limit/offset style varies; Derby has no
    * LIMIT keyword — ANSI FETCH; MySQL has no NULLS FIRST/LAST).
    */
  def select(sel: Select, dialect: graft.sources.Dialect): String =
    selectBase(sel, dialect) + dialect.limitClause(sel.limit, sel.offset)

  private def selectBase(sel: Select, dialect: graft.sources.Dialect): String = {
    val sb = new StringBuilder("SELECT ")
    if (sel.distinct) sb.append("DISTINCT ")
    sb.append(sel.columns.map(columnExpr).mkString(", "))
    sel.fromSelect match {
      case Some(sub) => sb.append(" FROM (").append(select(sub, dialect)).append(") AS ").append(ident(sel.table))
      case None      => sb.append(" FROM ").append(ident(sel.table))
    }
    for (j <- sel.joins) {
      j.subSelect match {
        case Some(sub) => sb.append(s" ${j.typ.sql} (${select(sub, dialect)})")
        case None      => sb.append(s" ${j.typ.sql} ${ident(j.table)}")
      }
      j.as match {
        case Some(a) => sb.append(s" AS ${ident(a)}")
        case None if j.subSelect.isDefined => sb.append(s" AS ${ident(j.table)}")
        case None => ()
      }
      if (j.typ != JoinType.Cross) {
        def qual(raw: String, defaultTable: String): String = raw.split('.') match {
          case Array(t, c) => s"${ident(t)}.${ident(c)}"
          case _           => s"${ident(defaultTable)}.${ident(raw)}"
        }
        val conds = j.on.map { case (l, r) =>
          s"${qual(l, sel.table)} = ${qual(r, j.name)}"
        }
        sb.append(" ON ").append(conds.mkString(" AND "))
      }
    }
    sel.filter.foreach(f => sb.append(" WHERE ").append(predicate(f)))
    if (sel.groupBy.nonEmpty) {
      // computed group keys (GROUP BY an alias of a non-Col projection)
      // render as the defining expression — plain ANSI, no alias reference
      val computed: Map[String, ColumnExpr] = sel.columns.collect {
        case Aliased(e, a) if !e.isInstanceOf[Col] && !e.containsAgg => a -> e
      }.toMap
      val key: Col => String = c =>
        if (c.table.isEmpty && computed.contains(c.name)) columnExpr(computed(c.name))
        else columnRef(c)
      sb.append(" GROUP BY ").append(sel.groupingMode match {
        case GroupingMode.Plain  => sel.groupBy.map(key).mkString(", ")
        case GroupingMode.Rollup => sel.groupBy.map(key).mkString("ROLLUP (", ", ", ")")
        case GroupingMode.Cube   => sel.groupBy.map(key).mkString("CUBE (", ", ", ")")
        case GroupingMode.Sets(sets) => sets
          .map(_.map(n => key(Col(n))).mkString("(", ", ", ")"))
          .mkString("GROUPING SETS (", ", ", ")")
      })
    }
    sel.having.foreach { h =>
      // substitute output aliases with their defining expressions: ANSI
      // HAVING cannot reference SELECT aliases (lateral aliasing is a
      // DuckDB/MySQL extension), but CAN repeat the aggregate expression
      val defs: Map[String, ColumnExpr] =
        sel.columns.collect { case Aliased(e, a) => a -> e }.toMap
      val resolve: Col => String = c =>
        if (c.table.isEmpty && defs.contains(c.name)) columnExpr(defs(c.name))
        else columnRef(c)
      sb.append(" HAVING ").append(predicate(h, resolve))
    }
    if (sel.orderBy.nonEmpty)
      // null placement must match Spark's defaults (ASC NULLS FIRST / DESC
      // NULLS LAST) — DuckDB's default is the opposite, which matters once
      // ROLLUP/CUBE emit NULL subtotal keys; syntax varies by dialect
      sb.append(" ORDER BY ").append(sel.orderBy.map(o =>
        dialect.orderByItem(ident(o.column), o.desc, o.nullsFirstEffective)).mkString(", "))
    sb.toString
  }

  /** Compound rendering: parenthesized operands (both keep any inner
    * order/limit), the compound's order/limit outside.
    */
  def compound(c: Compound): String = {
    val base = s"(${select(c.left)}) ${c.op.sql} (${select(c.right)})"
    val ord = if (c.orderBy.isEmpty) "" else
      " ORDER BY " + c.orderBy.map(o =>
        graft.sources.Dialect.Ansi.orderByItem(ident(o.column), o.desc, o.nullsFirstEffective)).mkString(", ")
    base + ord + c.limit.map(n => s" LIMIT $n").getOrElse("")
  }

  def delete(del: Delete): String =
    "DELETE FROM " + ident(del.table) + del.filter.map(f => " WHERE " + predicate(f)).getOrElse("")
}
