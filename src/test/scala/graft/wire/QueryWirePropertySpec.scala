package graft.wire

import graft.adt._
import graft.core.FxType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the query-ADT codec round-trips ARBITRARY IR trees, not
  * just the registry's hand-written queries — random column-expression
  * trees (nested CASE, casts, arithmetic, scalar fns, aggregates, windows),
  * random filter trees over the full predicate surface, and random Select
  * shells (joins, grouping modes, having, limits). Fixed seed, raw
  * ScalaCheck Gens (the scalatest bridge artifact is not in the offline
  * cache), so failures are reproducible.
  */
class QueryWirePropertySpec extends AnyFunSuite {

  private val nameGen: Gen[String] = Gen.oneOf("a", "b", "c", "col_x", "t1")

  private val valueGen: Gen[graft.core.FxValue] = Gen.oneOf(
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(V.i32),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(V.i64),
    Gen.chooseNum(-1e9, 1e9).map(V.f64),
    Gen.alphaNumStr.map(s => V.str(s.take(10))),
    Gen.oneOf(true, false).map(V.bool),
    Gen.const(V.date(2024, 2, 29)),
    Gen.const(V.dateTime(2025, 6, 1, 12, 30, 15)))

  private val condOpGen: Gen[CondOp] = Gen.oneOf(
    valueGen.map(CondOp.Equal), valueGen.map(CondOp.NotEqual),
    valueGen.map(CondOp.Greater), valueGen.map(CondOp.GreaterEqual),
    valueGen.map(CondOp.Less), valueGen.map(CondOp.LessEqual),
    Gen.listOfN(3, valueGen).map(CondOp.In(_)),
    Gen.zip(valueGen, valueGen).map { case (a, b) => CondOp.Between(a, b) },
    Gen.const(CondOp.Like("%x_y%")),
    Gen.const(CondOp.IsNull), Gen.const(CondOp.IsNotNull))

  private def exprGen(depth: Int): Gen[Expr] = {
    val leaf = Gen.zip(nameGen, condOpGen).map { case (n, op) => Cond(Col(n), op) }
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> Gen.listOfN(2, exprGen(depth - 1)).map(And(_)),
      1 -> Gen.listOfN(2, exprGen(depth - 1)).map(Or(_)),
      1 -> exprGen(depth - 1).map(Not(_)))
  }

  private val typeGen: Gen[FxType] = Gen.oneOf(
    FxType.TI32, FxType.TI64, FxType.TF64, FxType.TString,
    FxType.TDecimal(18, 2), FxType.TDate)

  private val scalarGen: Gen[ScalarFn] = Gen.oneOf(
    ScalarFn.Abs, ScalarFn.Lower, ScalarFn.Upper, ScalarFn.Trim,
    ScalarFn.CharLength, ScalarFn.Concat, ScalarFn.Coalesce,
    ScalarFn.Extract("month"), ScalarFn.DateTrunc("day"))

  private val aggGen: Gen[AggFn] = Gen.oneOf(
    Gen.const(AggFn.Max), Gen.const(AggFn.Min), Gen.const(AggFn.Sum),
    Gen.const(AggFn.Avg), Gen.const(AggFn.Count), Gen.const(AggFn.Median),
    Gen.choose(0.0, 1.0).map(AggFn.Quantile))

  private def colExprGen(depth: Int): Gen[ColumnExpr] = {
    val leaf: Gen[ColumnExpr] = Gen.frequency(
      3 -> Gen.zip(nameGen, Gen.option(Gen.const("tbl"))).map { case (n, t) => Col(n, t) },
      1 -> valueGen.map(Lit))
    if (depth <= 0) leaf
    else {
      val sub = colExprGen(depth - 1)
      Gen.frequency(
        3 -> leaf,
        1 -> Gen.zip(sub, Gen.identifier.map(_.take(6))).map { case (e, a) => e.as(a.nonEmpty match { case true => a; case false => "al" }) },
        1 -> Gen.zip(sub, typeGen).map { case (e, t) => Cast(e, t) },
        1 -> Gen.zip(Gen.oneOf(ArithOp.Add, ArithOp.Sub, ArithOp.Mul, ArithOp.Div), sub, sub)
          .map { case (op, l, r) => BinOp(op, l, r) },
        1 -> Gen.zip(scalarGen, Gen.listOfN(2, sub)).map { case (f, as) => Fn(f, as) },
        1 -> Gen.zip(aggGen, sub, Gen.oneOf(true, false)).map { case (f, a, d) => Agg(f, a, d) },
        1 -> Gen.zip(exprGen(1), sub, Gen.option(sub))
          .map { case (p, v, dflt) => CaseWhen(Seq((p, v)), dflt) },
        1 -> windowGen(sub))
    }
  }

  private def windowGen(argGen: Gen[ColumnExpr]): Gen[ColumnExpr] = for {
    fn <- Gen.oneOf(
      Gen.const(WindowFn.RowNumber), Gen.const(WindowFn.Rank),
      argGen.map(WindowFn.Lag(_, 2)), argGen.map(WindowFn.Lead(_, 1)),
      argGen.map(WindowFn.WAgg(AggFn.Sum, _)),
      Gen.chooseNum(2, 10).map(WindowFn.Ntile),
      Gen.const(WindowFn.PercentRank), Gen.const(WindowFn.CumeDist),
      argGen.map(WindowFn.FirstValue), argGen.map(WindowFn.LastValue))
    parts <- Gen.listOfN(1, nameGen.map(Col(_)))
    ords <- Gen.listOfN(1, nameGen.map(Order.asc))
    frame <- Gen.option(Gen.const((FrameBound.Preceding(3), FrameBound.CurrentRow)))
  } yield WinExpr(fn, WindowDef(parts, ords, frame))

  private def selectGen: Gen[Select] = selectGen(1)

  private def selectGen(nestDepth: Int): Gen[Select] = for {
    cols <- Gen.nonEmptyListOf(colExprGen(2)).map(_.take(4))
    fromSel <- if (nestDepth <= 0) Gen.const(None: Option[Select])
      else Gen.option(Gen.lzy(selectGen(nestDepth - 1)))
    filter <- Gen.option(exprGen(2))
    joins <- Gen.listOfN(1, Gen.zip(
      Gen.oneOf(JoinType.Inner, JoinType.Left, JoinType.Right, JoinType.Full,
        JoinType.Semi, JoinType.Anti, JoinType.Cross),
      Gen.oneOf(true, false),
      if (nestDepth <= 0) Gen.const(None: Option[Select])
      else Gen.option(Gen.lzy(selectGen(0))))).map(_.map { case (t, b, sub) =>
        Join("dim", Seq(("k1", "k2")), t, as = Some("d"), broadcastHint = b,
          subSelect = sub) })
    grouping <- Gen.oneOf(GroupingMode.Plain, GroupingMode.Rollup, GroupingMode.Cube,
      GroupingMode.Sets(Seq(Seq("a", "b"), Seq("b"), Seq.empty)))
    groupBy <- Gen.listOfN(2, nameGen.map(Col(_)))
    having <- Gen.option(exprGen(1))
    orderBy <- Gen.listOfN(2, Gen.zip(nameGen, Gen.oneOf(true, false),
      Gen.option(Gen.oneOf(true, false))).map { case (n, d, nf) => Order(n, d, nf) })
    limit <- Gen.option(Gen.chooseNum(0L, 1000L))
    offset <- Gen.option(Gen.chooseNum(0L, 100L))
    distinct <- Gen.oneOf(true, false)
  } yield Select("fact", cols, fromSel, filter, joins, groupBy, having, orderBy,
    limit, offset, distinct, grouping)

  test("500 random Selects round-trip structurally and render identically") {
    val seed0 = Seed(42L)
    var seed = seed0
    var n = 0
    while (n < 500) {
      val sel = selectGen.pureApply(Gen.Parameters.default, seed)
      val back = QueryWire.fromJson(QueryWire.toJson(sel))
      assert(back === sel, s"\nseed=$seed\norig: $sel\nback: $back")
      assert(graft.exec.SqlRenderer.select(back) === graft.exec.SqlRenderer.select(sel))
      seed = seed.next
      n += 1
    }
  }

  test("200 random Compounds round-trip and render identically") {
    var seed = Seed(99L)
    for (_ <- 0 until 200) {
      val g = for {
        op <- Gen.oneOf(SetOp.UnionAll, SetOp.Union, SetOp.Intersect, SetOp.Except)
        l <- selectGen
        r <- selectGen
        ords <- Gen.listOfN(1, nameGen.map(Order.asc))
        lim <- Gen.option(Gen.chooseNum(1L, 50L))
      } yield Compound(op, l, r, ords, lim)
      val c = g.pureApply(Gen.Parameters.default, seed)
      val back = QueryWire.compoundFromJson(QueryWire.compoundToJson(c))
      assert(back === c)
      assert(graft.exec.SqlRenderer.compound(back) === graft.exec.SqlRenderer.compound(c))
      seed = seed.next
    }
  }

  test("500 random Deletes round-trip") {
    var seed = Seed(7L)
    for (_ <- 0 until 500) {
      val del = Delete("t", Some(exprGen(3).pureApply(Gen.Parameters.default, seed)))
      val back = QueryWire.deleteFromJson(QueryWire.deleteToJson(del))
      assert(back === del)
      seed = seed.next
    }
  }
}
