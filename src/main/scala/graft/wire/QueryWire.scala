package graft.wire

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import graft.adt._
import graft.core._

/** JSON wire codec for the QUERY ADT — the reference's query IR is
  * serde-serializable end to end (`#[derive(Serialize, Deserialize)]` on
  * every sql_adt type, fabrix-sql/src/builder/sql_adt.rs:50-181): queries
  * arrive over the wire in its service deployments. This is the same
  * capability for our IR: `Select`/`Delete` ⇄ a stable JSON shape, so a
  * non-JVM client can author queries and submit them to either execution
  * path (native Translator or SQL pushdown).
  *
  * Encoding is tagged-union JSON (one discriminating key per node), values
  * carry their FxType tag so decode is lossless — including the unsigned /
  * decimal / temporal variants Spark itself can't round-trip through
  * untyped JSON.
  */
object QueryWire {

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ------------------------------------------------------------ FxType ----

  def typeTag(t: FxType): String = t match {
    case FxType.TBool          => "bool"
    case FxType.TI8            => "i8"
    case FxType.TI16           => "i16"
    case FxType.TI32           => "i32"
    case FxType.TI64           => "i64"
    case FxType.TU8            => "u8"
    case FxType.TU16           => "u16"
    case FxType.TU32           => "u32"
    case FxType.TU64           => "u64"
    case FxType.TF32           => "f32"
    case FxType.TF64           => "f64"
    case FxType.TString        => "string"
    case FxType.TDate          => "date"
    case FxType.TTime          => "time"
    case FxType.TDateTime      => "datetime"
    case FxType.TDecimal(p, s) => s"decimal($p,$s)"
    case FxType.TUuid          => "uuid"
    case FxType.TBytes         => "bytes"
    case FxType.TNull          => "null"
  }

  def parseType(tag: String): FxType = tag match {
    case "bool"     => FxType.TBool
    case "i8"       => FxType.TI8
    case "i16"      => FxType.TI16
    case "i32"      => FxType.TI32
    case "i64"      => FxType.TI64
    case "u8"       => FxType.TU8
    case "u16"      => FxType.TU16
    case "u32"      => FxType.TU32
    case "u64"      => FxType.TU64
    case "f32"      => FxType.TF32
    case "f64"      => FxType.TF64
    case "string"   => FxType.TString
    case "date"     => FxType.TDate
    case "time"     => FxType.TTime
    case "datetime" => FxType.TDateTime
    case "uuid"     => FxType.TUuid
    case "bytes"    => FxType.TBytes
    case "null"     => FxType.TNull
    case d if d.startsWith("decimal(") =>
      val dims = d.stripPrefix("decimal(").stripSuffix(")").split(',')
      FxType.TDecimal(dims(0).trim.toInt, dims(1).trim.toInt)
    case other => throw new IllegalArgumentException(s"unknown type tag: $other")
  }

  // ----------------------------------------------------------- FxValue ----

  def valueNode(v: FxValue): ObjectNode = {
    val o = F.objectNode()
    o.put("t", typeTag(v.fxType))
    v match {
      case FxNull            => ()
      case FxBool(x)         => o.put("v", x)
      case FxI8(x)           => o.put("v", x.toInt)
      case FxI16(x)          => o.put("v", x.toInt)
      case FxI32(x)          => o.put("v", x)
      case FxI64(x)          => o.put("v", x)
      case FxU8(x)           => o.put("v", x.toInt)
      case FxU16(x)          => o.put("v", x)
      case FxU32(x)          => o.put("v", x)
      case FxU64(x)          => o.put("v", x.toString) // > Long range: string
      case FxF32(x)          => o.put("v", x)
      case FxF64(x)          => o.put("v", x)
      case FxString(x)       => o.put("v", x)
      case FxDate(days)      => o.put("v", days)
      case FxTime(nanos)     => o.put("v", nanos)
      case FxDateTime(nanos) => o.put("v", nanos)
      case FxDecimal(x)      => o.put("v", x.underlying.toPlainString)
      case FxUuid(x)         => o.put("v", x.toString)
      case FxBytes(x)        => o.put("v", java.util.Base64.getEncoder.encodeToString(x))
    }
    o
  }

  def parseValue(n: JsonNode): FxValue = {
    val v = n.get("v")
    parseType(n.get("t").asText()) match {
      case FxType.TNull          => FxNull
      case FxType.TBool          => FxBool(v.asBoolean())
      case FxType.TI8            => FxI8(v.asInt().toByte)
      case FxType.TI16           => FxI16(v.asInt().toShort)
      case FxType.TI32           => FxI32(v.asInt())
      case FxType.TI64           => FxI64(v.asLong())
      case FxType.TU8            => FxU8(v.asInt().toShort)
      case FxType.TU16           => FxU16(v.asInt())
      case FxType.TU32           => FxU32(v.asLong())
      case FxType.TU64           => FxU64(BigInt(v.asText()))
      case FxType.TF32           => FxF32(v.floatValue())
      case FxType.TF64           => FxF64(v.asDouble())
      case FxType.TString        => FxString(v.asText())
      case FxType.TDate          => FxDate(v.asInt())
      case FxType.TTime          => FxTime(v.asLong())
      case FxType.TDateTime      => FxDateTime(v.asLong())
      case FxType.TDecimal(_, _) => FxDecimal(BigDecimal(v.asText()))
      case FxType.TUuid          => FxUuid(java.util.UUID.fromString(v.asText()))
      case FxType.TBytes         => FxBytes(java.util.Base64.getDecoder.decode(v.asText()))
    }
  }

  // -------------------------------------------------------- ColumnExpr ----

  private def aggTag(fn: AggFn): String = fn match {
    case AggFn.Max => "max"; case AggFn.Min => "min"; case AggFn.Sum => "sum"
    case AggFn.Avg => "avg"; case AggFn.Count => "count"; case AggFn.Median => "median"
    case AggFn.Quantile(p) => s"quantile($p)"
  }
  private def parseAgg(tag: String): AggFn = tag match {
    case "max" => AggFn.Max; case "min" => AggFn.Min; case "sum" => AggFn.Sum
    case "avg" => AggFn.Avg; case "count" => AggFn.Count; case "median" => AggFn.Median
    case q if q.startsWith("quantile(") =>
      AggFn.Quantile(q.stripPrefix("quantile(").stripSuffix(")").toDouble)
    case other => throw new IllegalArgumentException(s"unknown agg fn: $other")
  }

  private def scalarTag(fn: ScalarFn): String = fn match {
    case ScalarFn.Abs => "abs"; case ScalarFn.IfNull => "ifnull"
    case ScalarFn.Coalesce => "coalesce"; case ScalarFn.CharLength => "char_length"
    case ScalarFn.Lower => "lower"; case ScalarFn.Upper => "upper"
    case ScalarFn.Round => "round"
    case ScalarFn.Substring => "substring"; case ScalarFn.Trim => "trim"
    case ScalarFn.Concat => "concat"; case ScalarFn.Replace => "replace"
    case ScalarFn.Extract(f) => s"extract($f)"
    case ScalarFn.DateTrunc(u) => s"date_trunc($u)"
  }
  private def parseScalar(tag: String): ScalarFn = tag match {
    case "abs" => ScalarFn.Abs; case "ifnull" => ScalarFn.IfNull
    case "coalesce" => ScalarFn.Coalesce; case "char_length" => ScalarFn.CharLength
    case "lower" => ScalarFn.Lower; case "upper" => ScalarFn.Upper
    case "round" => ScalarFn.Round
    case "substring" => ScalarFn.Substring; case "trim" => ScalarFn.Trim
    case "concat" => ScalarFn.Concat; case "replace" => ScalarFn.Replace
    case e if e.startsWith("extract(") =>
      ScalarFn.Extract(e.stripPrefix("extract(").stripSuffix(")"))
    case d if d.startsWith("date_trunc(") =>
      ScalarFn.DateTrunc(d.stripPrefix("date_trunc(").stripSuffix(")"))
    case other => throw new IllegalArgumentException(s"unknown scalar fn: $other")
  }

  private def arithTag(op: ArithOp): String = op.symbol
  private def parseArith(tag: String): ArithOp = tag match {
    case "+" => ArithOp.Add; case "-" => ArithOp.Sub
    case "*" => ArithOp.Mul; case "/" => ArithOp.Div
    case other => throw new IllegalArgumentException(s"unknown arith op: $other")
  }

  private def colNode(c: Col): ObjectNode = {
    val o = F.objectNode()
    o.put("name", c.name)
    c.table.foreach(o.put("table", _))
    o
  }
  private def parseCol(n: JsonNode): Col =
    Col(n.get("name").asText(), Option(n.get("table")).map(_.asText()))

  def columnNode(e: ColumnExpr): ObjectNode = {
    val o = F.objectNode()
    e match {
      case c: Col        => o.set[ObjectNode]("col", colNode(c))
      case Lit(v)        => o.set[ObjectNode]("lit", valueNode(v))
      case Aliased(x, a) =>
        val inner = F.objectNode()
        inner.set[ObjectNode]("e", columnNode(x)); inner.put("as", a)
        o.set[ObjectNode]("alias", inner)
      case CountStar     => o.set[ObjectNode]("count_star", F.objectNode())
      case Cast(x, t)    =>
        val inner = F.objectNode()
        inner.set[ObjectNode]("e", columnNode(x)); inner.put("to", typeTag(t))
        o.set[ObjectNode]("cast", inner)
      case BinOp(op, l, r) =>
        val inner = F.objectNode()
        inner.put("op", arithTag(op))
        inner.set[ObjectNode]("l", columnNode(l)); inner.set[ObjectNode]("r", columnNode(r))
        o.set[ObjectNode]("binop", inner)
      case Fn(fn, args)  =>
        val inner = F.objectNode()
        inner.put("name", scalarTag(fn))
        val arr = F.arrayNode(); args.foreach(a => arr.add(columnNode(a)))
        inner.set[ArrayNode]("args", arr)
        o.set[ObjectNode]("fn", inner)
      case Agg(fn, arg, distinct) =>
        val inner = F.objectNode()
        inner.put("fn", aggTag(fn))
        inner.set[ObjectNode]("arg", columnNode(arg))
        inner.put("distinct", distinct)
        o.set[ObjectNode]("agg", inner)
      case CaseWhen(bs, d) =>
        val inner = F.objectNode()
        val arr = F.arrayNode()
        bs.foreach { case (p, v) =>
          val b = F.objectNode()
          b.set[ObjectNode]("when", exprNode(p)); b.set[ObjectNode]("then", columnNode(v))
          arr.add(b)
        }
        inner.set[ArrayNode]("branches", arr)
        d.foreach(v => inner.set[ObjectNode]("else", columnNode(v)))
        o.set[ObjectNode]("case", inner)
      case WinExpr(fn, over) =>
        val inner = F.objectNode()
        inner.set[ObjectNode]("fn", windowFnNode(fn))
        if (over.partitionBy.nonEmpty) {
          val arr = F.arrayNode(); over.partitionBy.foreach(c => arr.add(colNode(c)))
          inner.set[ArrayNode]("partition_by", arr)
        }
        if (over.orderBy.nonEmpty) inner.set[ArrayNode]("order_by", orderNodes(over.orderBy))
        over.frame.foreach { case (lo, hi) =>
          val fr = F.objectNode()
          fr.set[ObjectNode]("lo", boundNode(lo)); fr.set[ObjectNode]("hi", boundNode(hi))
          inner.set[ObjectNode]("frame", fr)
        }
        o.set[ObjectNode]("win", inner)
    }
    o
  }

  private def windowFnNode(fn: WindowFn): ObjectNode = {
    val o = F.objectNode()
    fn match {
      case WindowFn.RowNumber  => o.put("kind", "row_number")
      case WindowFn.Rank       => o.put("kind", "rank")
      case WindowFn.DenseRank  => o.put("kind", "dense_rank")
      case WindowFn.Lag(a, n)  =>
        o.put("kind", "lag"); o.put("offset", n); o.set[ObjectNode]("arg", columnNode(a))
      case WindowFn.Lead(a, n) =>
        o.put("kind", "lead"); o.put("offset", n); o.set[ObjectNode]("arg", columnNode(a))
      case WindowFn.WAgg(f, a) =>
        o.put("kind", "agg"); o.put("fn", aggTag(f)); o.set[ObjectNode]("arg", columnNode(a))
      case WindowFn.Ntile(n)      => o.put("kind", "ntile"); o.put("n", n)
      case WindowFn.PercentRank   => o.put("kind", "percent_rank")
      case WindowFn.CumeDist      => o.put("kind", "cume_dist")
      case WindowFn.FirstValue(a) =>
        o.put("kind", "first_value"); o.set[ObjectNode]("arg", columnNode(a))
      case WindowFn.LastValue(a)  =>
        o.put("kind", "last_value"); o.set[ObjectNode]("arg", columnNode(a))
    }
    o
  }

  private def parseWindowFn(n: JsonNode): WindowFn = n.get("kind").asText() match {
    case "row_number" => WindowFn.RowNumber
    case "rank"       => WindowFn.Rank
    case "dense_rank" => WindowFn.DenseRank
    case "lag"        => WindowFn.Lag(parseColumn(n.get("arg")), n.get("offset").asInt())
    case "lead"       => WindowFn.Lead(parseColumn(n.get("arg")), n.get("offset").asInt())
    case "agg"        => WindowFn.WAgg(parseAgg(n.get("fn").asText()), parseColumn(n.get("arg")))
    case "ntile"        => WindowFn.Ntile(n.get("n").asInt())
    case "percent_rank" => WindowFn.PercentRank
    case "cume_dist"    => WindowFn.CumeDist
    case "first_value"  => WindowFn.FirstValue(parseColumn(n.get("arg")))
    case "last_value"   => WindowFn.LastValue(parseColumn(n.get("arg")))
    case other        => throw new IllegalArgumentException(s"unknown window fn: $other")
  }

  private def boundNode(b: FrameBound): ObjectNode = {
    val o = F.objectNode()
    b match {
      case FrameBound.UnboundedPreceding => o.put("kind", "unbounded_preceding")
      case FrameBound.Preceding(n)       => o.put("kind", "preceding"); o.put("n", n)
      case FrameBound.CurrentRow         => o.put("kind", "current_row")
      case FrameBound.Following(n)       => o.put("kind", "following"); o.put("n", n)
      case FrameBound.UnboundedFollowing => o.put("kind", "unbounded_following")
    }
    o
  }
  private def parseBound(n: JsonNode): FrameBound = n.get("kind").asText() match {
    case "unbounded_preceding" => FrameBound.UnboundedPreceding
    case "preceding"           => FrameBound.Preceding(n.get("n").asInt())
    case "current_row"         => FrameBound.CurrentRow
    case "following"           => FrameBound.Following(n.get("n").asInt())
    case "unbounded_following" => FrameBound.UnboundedFollowing
    case other                 => throw new IllegalArgumentException(s"unknown frame bound: $other")
  }

  def parseColumn(n: JsonNode): ColumnExpr =
    if (n.has("col")) parseCol(n.get("col"))
    else if (n.has("lit")) Lit(parseValue(n.get("lit")))
    else if (n.has("alias")) {
      val a = n.get("alias"); Aliased(parseColumn(a.get("e")), a.get("as").asText())
    } else if (n.has("count_star")) CountStar
    else if (n.has("cast")) {
      val c = n.get("cast"); Cast(parseColumn(c.get("e")), parseType(c.get("to").asText()))
    } else if (n.has("binop")) {
      val b = n.get("binop")
      BinOp(parseArith(b.get("op").asText()), parseColumn(b.get("l")), parseColumn(b.get("r")))
    } else if (n.has("fn")) {
      val f = n.get("fn")
      Fn(parseScalar(f.get("name").asText()),
        iter(f.get("args")).map(parseColumn).toSeq)
    } else if (n.has("agg")) {
      val a = n.get("agg")
      Agg(parseAgg(a.get("fn").asText()), parseColumn(a.get("arg")), a.get("distinct").asBoolean())
    } else if (n.has("case")) {
      val c = n.get("case")
      CaseWhen(
        iter(c.get("branches")).map(b =>
          (parseExpr(b.get("when")), parseColumn(b.get("then")))).toSeq,
        Option(c.get("else")).map(parseColumn))
    } else if (n.has("win")) {
      val w = n.get("win")
      val parts = Option(w.get("partition_by")).map(iter(_).map(parseCol).toSeq).getOrElse(Nil)
      val ords = Option(w.get("order_by")).map(parseOrders).getOrElse(Nil)
      val frame = Option(w.get("frame")).map(fr => (parseBound(fr.get("lo")), parseBound(fr.get("hi"))))
      WinExpr(parseWindowFn(w.get("fn")), WindowDef(parts, ords, frame))
    } else throw new IllegalArgumentException(s"unknown column expr: $n")

  // -------------------------------------------------------------- Expr ----

  def exprNode(e: Expr): ObjectNode = {
    val o = F.objectNode()
    e match {
      case And(es) =>
        val arr = F.arrayNode(); es.foreach(x => arr.add(exprNode(x)))
        o.set[ArrayNode]("and", arr)
      case Or(es) =>
        val arr = F.arrayNode(); es.foreach(x => arr.add(exprNode(x)))
        o.set[ArrayNode]("or", arr)
      case Not(x) => o.set[ObjectNode]("not", exprNode(x))
      case Cond(c, op) =>
        val inner = F.objectNode()
        inner.set[ObjectNode]("column", colNode(c))
        val opNode = F.objectNode()
        op match {
          case CondOp.Equal(v)        => opNode.set[ObjectNode]("eq", valueNode(v))
          case CondOp.NotEqual(v)     => opNode.set[ObjectNode]("ne", valueNode(v))
          case CondOp.Greater(v)      => opNode.set[ObjectNode]("gt", valueNode(v))
          case CondOp.GreaterEqual(v) => opNode.set[ObjectNode]("ge", valueNode(v))
          case CondOp.Less(v)         => opNode.set[ObjectNode]("lt", valueNode(v))
          case CondOp.LessEqual(v)    => opNode.set[ObjectNode]("le", valueNode(v))
          case CondOp.In(vs) =>
            val arr = F.arrayNode(); vs.foreach(v => arr.add(valueNode(v)))
            opNode.set[ArrayNode]("in", arr)
          case CondOp.Between(lo, hi) =>
            val arr = F.arrayNode(); arr.add(valueNode(lo)); arr.add(valueNode(hi))
            opNode.set[ArrayNode]("between", arr)
          case CondOp.Like(p)   => opNode.put("like", p)
          case CondOp.IsNull    => opNode.set[ObjectNode]("is_null", F.objectNode())
          case CondOp.IsNotNull => opNode.set[ObjectNode]("is_not_null", F.objectNode())
        }
        inner.set[ObjectNode]("op", opNode)
        o.set[ObjectNode]("cond", inner)
    }
    o
  }

  def parseExpr(n: JsonNode): Expr =
    if (n.has("and")) And(iter(n.get("and")).map(parseExpr).toSeq)
    else if (n.has("or")) Or(iter(n.get("or")).map(parseExpr).toSeq)
    else if (n.has("not")) Not(parseExpr(n.get("not")))
    else if (n.has("cond")) {
      val c = n.get("cond")
      val opNode = c.get("op")
      val op =
        if (opNode.has("eq")) CondOp.Equal(parseValue(opNode.get("eq")))
        else if (opNode.has("ne")) CondOp.NotEqual(parseValue(opNode.get("ne")))
        else if (opNode.has("gt")) CondOp.Greater(parseValue(opNode.get("gt")))
        else if (opNode.has("ge")) CondOp.GreaterEqual(parseValue(opNode.get("ge")))
        else if (opNode.has("lt")) CondOp.Less(parseValue(opNode.get("lt")))
        else if (opNode.has("le")) CondOp.LessEqual(parseValue(opNode.get("le")))
        else if (opNode.has("in")) CondOp.In(iter(opNode.get("in")).map(parseValue).toSeq)
        else if (opNode.has("between")) {
          val arr = opNode.get("between")
          CondOp.Between(parseValue(arr.get(0)), parseValue(arr.get(1)))
        }
        else if (opNode.has("like")) CondOp.Like(opNode.get("like").asText())
        else if (opNode.has("is_null")) CondOp.IsNull
        else if (opNode.has("is_not_null")) CondOp.IsNotNull
        else throw new IllegalArgumentException(s"unknown cond op: $opNode")
      Cond(parseCol(c.get("column")), op)
    } else throw new IllegalArgumentException(s"unknown expr: $n")

  // ------------------------------------------------------ Select/Delete ----

  private def orderNodes(os: Seq[Order]): ArrayNode = {
    val arr = F.arrayNode()
    os.foreach { o =>
      val n = F.objectNode(); n.put("column", o.column); n.put("desc", o.desc)
      o.nullsFirst.foreach(n.put("nulls_first", _))
      arr.add(n)
    }
    arr
  }
  private def parseOrders(n: JsonNode): Seq[Order] =
    iter(n).map(o => Order(o.get("column").asText(), o.get("desc").asBoolean(),
      Option(o.get("nulls_first")).map(_.asBoolean()))).toSeq

  private def joinTypeTag(t: JoinType): String = t match {
    case JoinType.Inner => "inner"; case JoinType.Left => "left"
    case JoinType.Right => "right"; case JoinType.Full => "full"
    case JoinType.Cross => "cross"; case JoinType.Semi => "semi"
    case JoinType.Anti  => "anti"
  }
  private def parseJoinType(tag: String): JoinType = tag match {
    case "inner" => JoinType.Inner; case "left" => JoinType.Left
    case "right" => JoinType.Right; case "full" => JoinType.Full
    case "cross" => JoinType.Cross; case "semi" => JoinType.Semi
    case "anti"  => JoinType.Anti
    case other   => throw new IllegalArgumentException(s"unknown join type: $other")
  }

  def selectNode(sel: Select): ObjectNode = {
    val o = F.objectNode()
    o.put("table", sel.table)
    sel.fromSelect.foreach(sub => o.set[ObjectNode]("from_select", selectNode(sub)))
    val cols = F.arrayNode(); sel.columns.foreach(c => cols.add(columnNode(c)))
    o.set[ArrayNode]("columns", cols)
    sel.filter.foreach(f => o.set[ObjectNode]("filter", exprNode(f)))
    if (sel.joins.nonEmpty) {
      val js = F.arrayNode()
      sel.joins.foreach { j =>
        val jn = F.objectNode()
        jn.put("table", j.table)
        val on = F.arrayNode()
        j.on.foreach { case (l, r) =>
          val p = F.arrayNode(); p.add(l); p.add(r); on.add(p)
        }
        jn.set[ArrayNode]("on", on)
        jn.put("type", joinTypeTag(j.typ))
        j.as.foreach(jn.put("as", _))
        if (j.broadcastHint) jn.put("broadcast", true)
        j.subSelect.foreach(sub => jn.set[ObjectNode]("sub_select", selectNode(sub)))
        js.add(jn)
      }
      o.set[ArrayNode]("joins", js)
    }
    if (sel.groupBy.nonEmpty) {
      val gs = F.arrayNode(); sel.groupBy.foreach(c => gs.add(colNode(c)))
      o.set[ArrayNode]("group_by", gs)
    }
    sel.having.foreach(h => o.set[ObjectNode]("having", exprNode(h)))
    sel.groupingMode match {
      case GroupingMode.Plain  => ()
      case GroupingMode.Rollup => o.put("grouping", "rollup")
      case GroupingMode.Cube   => o.put("grouping", "cube")
      case GroupingMode.Sets(sets) =>
        o.put("grouping", "sets")
        val arr = F.arrayNode()
        sets.foreach { s =>
          val inner = F.arrayNode(); s.foreach(inner.add); arr.add(inner)
        }
        o.set[ArrayNode]("grouping_sets", arr)
    }
    if (sel.orderBy.nonEmpty) o.set[ArrayNode]("order_by", orderNodes(sel.orderBy))
    sel.limit.foreach(o.put("limit", _))
    sel.offset.foreach(o.put("offset", _))
    if (sel.distinct) o.put("distinct", true)
    o
  }

  def parseSelect(n: JsonNode): Select = Select(
    table = n.get("table").asText(),
    columns = iter(n.get("columns")).map(parseColumn).toSeq,
    fromSelect = Option(n.get("from_select")).map(parseSelect),
    filter = Option(n.get("filter")).map(parseExpr),
    joins = Option(n.get("joins")).map(iter(_).map { jn =>
      Join(
        table = jn.get("table").asText(),
        on = iter(jn.get("on")).map(p => (p.get(0).asText(), p.get(1).asText())).toSeq,
        typ = parseJoinType(jn.get("type").asText()),
        as = Option(jn.get("as")).map(_.asText()),
        broadcastHint = Option(jn.get("broadcast")).exists(_.asBoolean()),
        subSelect = Option(jn.get("sub_select")).map(parseSelect))
    }.toSeq).getOrElse(Nil),
    groupBy = Option(n.get("group_by")).map(iter(_).map(parseCol).toSeq).getOrElse(Nil),
    having = Option(n.get("having")).map(parseExpr),
    orderBy = Option(n.get("order_by")).map(parseOrders).getOrElse(Nil),
    limit = Option(n.get("limit")).map(_.asLong()),
    offset = Option(n.get("offset")).map(_.asLong()),
    distinct = Option(n.get("distinct")).exists(_.asBoolean()),
    groupingMode = Option(n.get("grouping")).map(_.asText()) match {
      case Some("rollup") => GroupingMode.Rollup
      case Some("cube")   => GroupingMode.Cube
      case Some("sets")   => GroupingMode.Sets(
        iter(n.get("grouping_sets")).map(s => iter(s).map(_.asText()).toSeq).toSeq)
      case _              => GroupingMode.Plain
    })

  def toJson(sel: Select): String = mapper.writeValueAsString(selectNode(sel))
  def fromJson(json: String): Select = parseSelect(mapper.readTree(json))

  private def setOpTag(op: SetOp): String = op match {
    case SetOp.UnionAll => "union_all"; case SetOp.Union => "union"
    case SetOp.Intersect => "intersect"; case SetOp.Except => "except"
  }
  private def parseSetOp(tag: String): SetOp = tag match {
    case "union_all" => SetOp.UnionAll; case "union" => SetOp.Union
    case "intersect" => SetOp.Intersect; case "except" => SetOp.Except
    case other => throw new IllegalArgumentException(s"unknown set op: $other")
  }

  def compoundToJson(c: Compound): String = {
    val o = F.objectNode()
    o.put("op", setOpTag(c.op))
    o.set[ObjectNode]("left", selectNode(c.left))
    o.set[ObjectNode]("right", selectNode(c.right))
    if (c.orderBy.nonEmpty) o.set[ArrayNode]("order_by", orderNodes(c.orderBy))
    c.limit.foreach(o.put("limit", _))
    mapper.writeValueAsString(o)
  }
  def compoundFromJson(json: String): Compound = {
    val n = mapper.readTree(json)
    Compound(
      parseSetOp(n.get("op").asText()),
      parseSelect(n.get("left")),
      parseSelect(n.get("right")),
      Option(n.get("order_by")).map(parseOrders).getOrElse(Nil),
      Option(n.get("limit")).map(_.asLong()))
  }

  def deleteToJson(del: Delete): String = {
    val o = F.objectNode()
    o.put("table", del.table)
    del.filter.foreach(f => o.set[ObjectNode]("filter", exprNode(f)))
    mapper.writeValueAsString(o)
  }
  def deleteFromJson(json: String): Delete = {
    val n = mapper.readTree(json)
    Delete(n.get("table").asText(), Option(n.get("filter")).map(parseExpr))
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    import scala.jdk.CollectionConverters._
    n.elements().asScala
  }
}
