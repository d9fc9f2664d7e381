package graft.wire

import graft.Registry
import graft.adt._
import graft.core.FxType
import graft.exec.SqlRenderer
import org.scalatest.funsuite.AnyFunSuite

/** Query-ADT wire codec: decode(encode(q)) must be STRUCTURALLY identical
  * for every IR feature, and the rendered SQL of a round-tripped query must
  * equal the original's — the property that lets a non-JVM client author
  * queries for either execution path.
  */
class QueryWireSpec extends AnyFunSuite {

  private def roundtrip(sel: Select): Unit = {
    val back = QueryWire.fromJson(QueryWire.toJson(sel))
    assert(back == sel, s"\norig: $sel\nback: $back")
    assert(SqlRenderer.select(back) == SqlRenderer.select(sel))
  }

  test("the flagship q1 round-trips (agg, cast, binop, filter, group, order)") {
    roundtrip(Registry.q1)
  }

  test("every registered ADT query round-trips") {
    // every Select the registry defines through the adt() helper exercises a
    // different IR corner (rollup/cube, windows, joins, scalar fns, …); the
    // codec must cover them all
    Registry.all // force registration
    val sels = Registry.adtSelects
    assert(sels.size >= 15, s"expected the full adt battery, got ${sels.keys}")
    sels.values.foreach(roundtrip)
  }

  test("joins of every type, aliases, broadcast hints") {
    roundtrip(Select(
      table = "orders",
      columns = Seq(Col("o_orderkey", Some("orders")), Col("c_name", Some("c2")).as("name")),
      joins = Seq(
        Join("customer", Seq(("o_custkey", "c_custkey")), JoinType.Left, as = Some("c2")),
        Join("nation", Seq(("c_nationkey", "n_nationkey"), ("x", "y")), JoinType.Semi,
          broadcastHint = true),
        Join("region", Nil, JoinType.Cross)),
      orderBy = Seq(Order.asc("o_orderkey"))))
  }

  test("filter tree with every predicate") {
    roundtrip(Select(
      table = "t",
      columns = Seq(Col("a")),
      filter = Some(And(Seq(
        Or(Seq(
          Cond(Col("a"), CondOp.Equal(V.str("x'y"))),
          Cond(Col("b"), CondOp.NotEqual(V.i64(-5))))),
        Not(Cond(Col("c"), CondOp.Between(V.f64(1.5), V.f64(2.5)))),
        Cond(Col("d"), CondOp.In(Seq(V.i32(1), V.i32(2), V.i32(3)))),
        Cond(Col("e"), CondOp.Like("%z%")),
        Cond(Col("f"), CondOp.IsNull),
        Cond(Col("g"), CondOp.IsNotNull),
        Cond(Col("h"), CondOp.Greater(V.dateTime(2024, 3, 1, 12, 30, 15))),
        Cond(Col("i"), CondOp.LessEqual(V.date(2024, 1, 1)))))))
    )
  }

  test("window functions with frames round-trip") {
    roundtrip(Select(
      table = "orders",
      columns = Seq(
        Col("o_orderkey"),
        WinExpr(WindowFn.Rank, WindowDef(
          partitionBy = Seq(Col("o_custkey")),
          orderBy = Seq(Order.desc("o_totalprice"), Order.asc("o_orderkey")))).as("r"),
        WinExpr(WindowFn.Lag(Col("o_totalprice"), 2), WindowDef(
          partitionBy = Seq(Col("o_custkey")),
          orderBy = Seq(Order.asc("o_orderkey")))).as("prev2"),
        Cast(WinExpr(WindowFn.WAgg(AggFn.Sum, Cast(Col("o_totalprice"), FxType.TDecimal(18, 2))),
          WindowDef(
            partitionBy = Seq(Col("o_custkey")),
            orderBy = Seq(Order.asc("o_orderkey")),
            frame = Some((FrameBound.Preceding(3), FrameBound.CurrentRow)))), FxType.TF64).as("mv"),
        WinExpr(WindowFn.RowNumber, WindowDef(
          orderBy = Seq(Order.asc("o_orderkey")),
          frame = Some((FrameBound.UnboundedPreceding, FrameBound.UnboundedFollowing)))).as("rn"))))
  }

  test("rollup/cube, distinct, limit/offset, scalar fns") {
    roundtrip(Select(
      table = "orders",
      columns = Seq(
        Col("o_orderstatus"),
        Fn(ScalarFn.Upper, Seq(Col("o_orderpriority"))).as("pri"),
        Fn(ScalarFn.Round, Seq(Col("o_totalprice"), Lit(V.i32(0)))).as("p0"),
        CountStar.as("n")),
      groupBy = Seq(Col("o_orderstatus"), Col("o_orderpriority")),
      groupingMode = GroupingMode.Cube,
      orderBy = Seq(Order.asc("o_orderstatus")),
      limit = Some(100),
      offset = Some(10),
      distinct = true))
  }

  test("exotic literal types survive (u64, decimal, uuid, bytes, null)") {
    import graft.core._
    roundtrip(Select(
      table = "t",
      columns = Seq(Col("a")),
      filter = Some(And(Seq(
        Cond(Col("u"), CondOp.Equal(FxU64(BigInt("18446744073709551615")))),
        Cond(Col("d"), CondOp.Equal(FxDecimal(BigDecimal("123456.789012345678901234")))),
        Cond(Col("id"), CondOp.Equal(FxUuid(java.util.UUID.fromString(
          "c6df7e96-5c2e-4e2e-8e3a-1f2b3c4d5e6f")))),
        Cond(Col("z"), CondOp.Equal(FxNull))))))
    )
  }

  test("bytes literal round-trips structurally") {
    import graft.core.FxBytes
    // FxBytes wraps Array[Byte], whose == is reference equality — compare
    // the decoded payload directly instead of the whole tree
    val sel = Select("t", Seq(Col("a")),
      filter = Some(Cond(Col("b"), CondOp.Equal(FxBytes(Array[Byte](1, 2, -3, 127))))))
    val back = QueryWire.fromJson(QueryWire.toJson(sel))
    val Some(Cond(_, CondOp.Equal(v))) = back.filter
    assert(v.asInstanceOf[FxBytes].v.toSeq == Seq[Byte](1, 2, -3, 127))
  }

  test("delete round-trips") {
    val del = Delete("orders", Some(Cond(Col("o_orderstatus"), CondOp.Equal(V.str("F")))))
    assert(QueryWire.deleteFromJson(QueryWire.deleteToJson(del)) == del)
    assert(QueryWire.deleteFromJson(QueryWire.deleteToJson(Delete("t"))) == Delete("t"))
  }

  test("golden shape stays stable (wire compatibility pin)") {
    val sel = Select("nation", Seq(Col("n_name"), CountStar.as("n")),
      filter = Some(Cond(Col("n_regionkey"), CondOp.Less(V.i32(3)))),
      groupBy = Seq(Col("n_name")))
    assert(QueryWire.toJson(sel) ==
      """{"table":"nation","columns":[{"col":{"name":"n_name"}},{"alias":{"e":{"count_star":{}},"as":"n"}}],""" +
      """"filter":{"cond":{"column":{"name":"n_regionkey"},"op":{"lt":{"t":"i32","v":3}}}},""" +
      """"group_by":[{"name":"n_name"}]}""")
  }
}
