package graft.exec

import graft.adt._
import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native execution path: translates the serializable query ADT into
  * DataFrame operations and lets Catalyst plan the physical execution
  * (scan → filter → join → agg → sort → limit). This replaces the
  * reference's render-SQL-and-ship-to-DB path (fabrix-sql/src/executor/
  * ec.rs:550-581) with a declarative plan, so predicate pushdown, column
  * pruning, join strategy selection (broadcast vs shuffle), partial
  * aggregation, and AQE all come from the optimizer instead of hand-rolled
  * scheduling. At cluster scale nothing here materializes on the driver.
  */
object Translator {

  /** Raw Scala value for a literal (Spark's lit() handles these natively). */
  private def raw(v: FxValue): Any = v match {
    case FxNull            => null
    case FxBool(b)         => b
    case FxI8(x)           => x
    case FxI16(x)          => x
    case FxI32(x)          => x
    case FxI64(x)          => x
    case FxU8(x)           => x
    case FxU16(x)          => x
    case FxU32(x)          => x
    case FxU64(x)          => new java.math.BigDecimal(x.underlying)
    case FxF32(x)          => x
    case FxF64(x)          => x
    case FxString(x)       => x
    case FxDate(days)      => java.time.LocalDate.ofEpochDay(days.toLong)
    case FxTime(nanos)     => nanos
    case FxDateTime(nanos) => java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(nanos, 1000000000L), Math.floorMod(nanos, 1000000000L).toInt,
      java.time.ZoneOffset.UTC)
    case FxDecimal(x)      => x.underlying
    case FxUuid(x)         => x.toString
    case FxBytes(x)        => x
  }

  def column(e: ColumnExpr): Column = e match {
    case Col(n, Some(t))  => col(s"$t.$n")
    case Col(n, None)     => col(n)
    case Lit(v)           => lit(raw(v))
    case Aliased(x, a)    => column(x).alias(a)
    case Cast(x, t)       => column(x).cast(t.sparkType)
    case CountStar        => count(lit(1))
    case BinOp(op, l, r)  => op match {
      case ArithOp.Add => column(l) + column(r)
      case ArithOp.Sub => column(l) - column(r)
      case ArithOp.Mul => column(l) * column(r)
      case ArithOp.Div => column(l) / column(r)
    }
    case Fn(fn, args) =>
      val cs = args.map(column)
      fn match {
        case ScalarFn.Abs                        => abs(cs.head)
        case ScalarFn.IfNull | ScalarFn.Coalesce => coalesce(cs: _*)
        case ScalarFn.CharLength                 => length(cs.head)
        case ScalarFn.Lower                      => lower(cs.head)
        case ScalarFn.Upper                      => upper(cs.head)
        case ScalarFn.Round => args(1) match {
          case Lit(FxI32(s)) => round(cs.head, s)
          case other => throw new IllegalArgumentException(s"ROUND scale must be int literal, got $other")
        }
        case ScalarFn.Substring => (args(1), args(2)) match {
          case (Lit(FxI32(p)), Lit(FxI32(l))) => substring(cs.head, p, l)
          case other => throw new IllegalArgumentException(s"SUBSTRING pos/len must be int literals, got $other")
        }
        case ScalarFn.Trim    => trim(cs.head)
        case ScalarFn.Concat  => concat(cs: _*)
        case ScalarFn.Replace => replace(cs(0), cs(1), cs(2))
        case ScalarFn.Extract(f) => (f match {
          case "year"   => year(cs.head)
          case "month"  => month(cs.head)
          case "day"    => dayofmonth(cs.head)
          case "hour"   => hour(cs.head)
          case "minute" => minute(cs.head)
          case "second" => second(cs.head)
        }).cast("long") // ANSI engines return BIGINT
        case ScalarFn.DateTrunc(u) => date_trunc(u, cs.head)
      }
    case Agg(fn, arg, distinct) =>
      val c = column(arg)
      fn match {
        case AggFn.Max    => max(c)
        case AggFn.Min    => min(c)
        case AggFn.Sum    => sum(c)
        case AggFn.Avg    => avg(c)
        case AggFn.Count  => if (distinct) count_distinct(c) else count(c)
        case AggFn.Median => median(c)
        // exact interpolated percentile (not approx_percentile: the result
        // must be partitioning-independent and oracle-matchable)
        case AggFn.Quantile(p) => percentile(c, lit(p))
      }
    case WinExpr(fn, over) => windowColumn(fn, over)
    case CaseWhen(branches, default) =>
      // foldRight keeps ANSI first-match-wins order
      branches.foldRight(default.map(column).getOrElse(lit(null))) {
        case ((cond, v), acc) => when(predicate(cond), column(v)).otherwise(acc)
      }
  }

  private def windowColumn(fn: WindowFn, over: WindowDef): Column = {
    import org.apache.spark.sql.expressions.Window
    def bound(b: FrameBound): Long = b match {
      case FrameBound.UnboundedPreceding => Window.unboundedPreceding
      case FrameBound.Preceding(n)       => -n.toLong
      case FrameBound.CurrentRow         => Window.currentRow
      case FrameBound.Following(n)       => n.toLong
      case FrameBound.UnboundedFollowing => Window.unboundedFollowing
    }
    var spec = Window.partitionBy(over.partitionBy.map(column): _*)
    if (over.orderBy.nonEmpty)
      spec = spec.orderBy(over.orderBy.map(sortCol): _*)
    over.frame.foreach { case (lo, hi) => spec = spec.rowsBetween(bound(lo), bound(hi)) }
    fn match {
      // ranking fns widen int → i64: the ADT types them i64 so results match
      // ANSI engines (DuckDB/Postgres return BIGINT)
      case WindowFn.RowNumber    => row_number().over(spec).cast("long")
      case WindowFn.Rank         => rank().over(spec).cast("long")
      case WindowFn.DenseRank    => dense_rank().over(spec).cast("long")
      case WindowFn.Lag(a, n)    => lag(column(a), n).over(spec)
      case WindowFn.Lead(a, n)   => lead(column(a), n).over(spec)
      case WindowFn.Ntile(n)     => ntile(n).over(spec).cast("long")
      case WindowFn.PercentRank  => percent_rank().over(spec)
      case WindowFn.CumeDist     => cume_dist().over(spec)
      case WindowFn.FirstValue(a) => first(column(a)).over(spec)
      case WindowFn.LastValue(a)  => last(column(a)).over(spec)
      case WindowFn.WAgg(f, a)   =>
        val c = column(a)
        // casts must wrap the WindowExpression, never sit between the
        // aggregate and .over() — WindowExpression(Cast(agg)) fails analysis
        f match {
          case AggFn.Max    => max(c).over(spec)
          case AggFn.Min    => min(c).over(spec)
          case AggFn.Sum    => sum(c).over(spec)
          case AggFn.Avg    => avg(c).over(spec)
          case AggFn.Count  => count(c).over(spec).cast("long")
          case AggFn.Median | AggFn.Quantile(_) =>
            throw new IllegalArgumentException(s"$f is not a windowed aggregate")
        }
    }
  }

  /** Sort column honoring the Order's explicit null placement. */
  def sortCol(o: Order): Column = (o.desc, o.nullsFirstEffective) match {
    case (false, true)  => col(o.column).asc_nulls_first
    case (false, false) => col(o.column).asc_nulls_last
    case (true, true)   => col(o.column).desc_nulls_first
    case (true, false)  => col(o.column).desc_nulls_last
  }

  def predicate(e: Expr): Column = e match {
    case And(es)  => es.map(predicate).reduce(_ && _)
    case Or(es)   => es.map(predicate).reduce(_ || _)
    case Not(x)   => !predicate(x)
    case Cond(c, op) =>
      val cc = column(c)
      op match {
        case CondOp.Equal(v)        => cc === lit(raw(v))
        case CondOp.NotEqual(v)     => cc =!= lit(raw(v))
        case CondOp.Greater(v)      => cc > lit(raw(v))
        case CondOp.GreaterEqual(v) => cc >= lit(raw(v))
        case CondOp.Less(v)         => cc < lit(raw(v))
        case CondOp.LessEqual(v)    => cc <= lit(raw(v))
        case CondOp.In(vs)          => cc.isin(vs.map(raw): _*)
        case CondOp.Between(lo, hi) => cc.between(lit(raw(lo)), lit(raw(hi)))
        case CondOp.Like(p)         => cc.like(p)
        case CondOp.IsNull          => cc.isNull
        case CondOp.IsNotNull       => cc.isNotNull
      }
  }

  private def hasAgg(e: ColumnExpr): Boolean = e.containsAgg

  /** Translate a Select against a table resolver (name → DataFrame). */
  def select(sel: Select, resolve: String => DataFrame): DataFrame = {
    var df = sel.fromSelect match {
      case Some(sub) => select(sub, resolve).alias(sel.table)
      case None      => resolve(sel.table).alias(sel.table)
    }

    // joins: qualify bare key names with the owning table so chained joins work
    for (j <- sel.joins) {
      val resolved = j.subSelect
        .map(select(_, resolve))
        .getOrElse(resolve(j.table))
        .alias(j.name)
      val right = if (j.broadcastHint) broadcast(resolved) else resolved
      df = j.typ match {
        case JoinType.Cross => df.crossJoin(right)
        case t =>
          val cond = j.on.map { case (l, r) =>
            val lq = if (l.contains(".")) l else s"${sel.table}.$l"
            val rq = if (r.contains(".")) r else s"${j.name}.$r"
            col(lq) === col(rq)
          }.reduce(_ && _)
          df.join(right, cond, t.spark)
      }
    }

    sel.filter.foreach(f => df = df.where(predicate(f)))

    val isAggQuery = sel.groupBy.nonEmpty || sel.columns.exists(hasAgg)
    var out =
      if (isAggQuery) {
        val (aggItems, keyItems) = sel.columns.partition(hasAgg)
        require(aggItems.nonEmpty, "aggregate query requires at least one aggregate column")
        val keyNames = sel.groupBy.map(_.name).toSet
        // computed group keys: a groupBy name may reference the ALIAS of a
        // non-Col projection (GROUP BY CASE …, GROUP BY fn(col) — keyed by
        // its output name); plain columns keep the group-by-base-name rule
        val computedKeys: Map[String, ColumnExpr] = sel.columns.collect {
          case Aliased(e, a) if !e.isInstanceOf[Col] && !e.containsAgg && keyNames.contains(a) => a -> e
        }.toMap
        keyItems.foreach { k =>
          val ok = k match {
            case Aliased(Col(n, _), _) => keyNames.contains(n)
            case Col(n, _)             => keyNames.contains(n)
            case Aliased(_, a)         => computedKeys.contains(a)
            case other => throw new IllegalArgumentException(s"non-aggregate projection $other must be a group key")
          }
          require(ok, s"non-aggregate projection ${k.outputName} not in GROUP BY")
        }
        val aggCols = aggItems.map(e => column(e).alias(e.outputName))
        val grouped =
          if (sel.groupBy.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
          else {
            // computed keys materialize as real columns FIRST, so every
            // grouping path (plain/rollup/cube/sets) keys on a plain
            // attribute. Passing aliased expressions into groupingSets is
            // NOT sound: the per-set copies must match the grouping
            // expressions by semantic equality, and alias occurrences get
            // distinct exprIds — a set entry that fails to match silently
            // nulls its key column in the output.
            val withKeys = computedKeys.foldLeft(df) {
              case (d, (name, e)) => d.withColumn(name, column(e))
            }
            val keys = sel.groupBy.map(g =>
              if (computedKeys.contains(g.name)) col(g.name) else column(g))
            val g = sel.groupingMode match {
              case GroupingMode.Plain      => withKeys.groupBy(keys: _*)
              case GroupingMode.Rollup     => withKeys.rollup(keys: _*)
              case GroupingMode.Cube       => withKeys.cube(keys: _*)
              case GroupingMode.Sets(sets) =>
                val keyNames2 = sel.groupBy.map(_.name).toSet
                sets.flatten.foreach(n => require(keyNames2.contains(n),
                  s"grouping set key $n not in GROUP BY"))
                withKeys.groupingSets(sets.map(_.map(col(_): Column)), keys: _*)
            }
            g.agg(aggCols.head, aggCols.tail: _*)
          }
        // restore projection order / aliases
        grouped.select(sel.columns.map {
          case a @ Aliased(Col(n, _), al) => col(n).alias(al)
          case c @ Col(n, _)              => col(n)
          case e                          => col(e.outputName)
        }: _*)
      } else {
        df.select(sel.columns.map(e => column(e).alias(e.outputName)): _*)
      }

    // HAVING: conditions reference output columns (group keys / aggregate
    // aliases), which after the projection restore are real columns of `out`
    // — so a plain where() here IS post-aggregation filtering
    sel.having.foreach { h =>
      require(isAggQuery, "HAVING requires an aggregate query")
      out = out.where(predicate(h))
    }

    if (sel.distinct) out = out.distinct()
    if (sel.orderBy.nonEmpty)
      out = out.orderBy(sel.orderBy.map(sortCol): _*)
    sel.offset.foreach(n => out = out.offset(n.toInt))
    sel.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  /** Compound set operation: operands translate independently, combine
    * positionally (ANSI), then the compound's own order/limit apply.
    */
  def compound(c: Compound, resolve: String => DataFrame): DataFrame = {
    val l = select(c.left, resolve)
    val r = select(c.right, resolve)
    var out = c.op match {
      case SetOp.UnionAll  => l.union(r)
      case SetOp.Union     => l.union(r).distinct()
      case SetOp.Intersect => l.intersect(r)
      case SetOp.Except    => l.except(r)
    }
    if (c.orderBy.nonEmpty)
      out = out.orderBy(c.orderBy.map(sortCol): _*)
    c.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  /** Native Delete semantics: the surviving rows (complement of the filter).
    * Pushdown Delete (JDBC) renders DELETE WHERE instead — see SqlRenderer.
    */
  def delete(del: Delete, resolve: String => DataFrame): DataFrame = {
    val df = resolve(del.table)
    del.filter match {
      case Some(f) => df.where(!predicate(f))
      case None    => df.limit(0)
    }
  }
}
