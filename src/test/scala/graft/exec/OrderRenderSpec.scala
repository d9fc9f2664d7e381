package graft.exec

import graft.adt._
import graft.sources.Dialect
import org.scalatest.funsuite.AnyFunSuite

/** Rendering contracts for ORDER BY null placement across dialects —
  * including MySQL's IS NULL prefix-key emulation (it has no NULLS
  * FIRST/LAST syntax).
  */
class OrderRenderSpec extends AnyFunSuite {

  private def render(o: Order, d: Dialect): String =
    d.orderByItem("\"c\"", o.desc, o.nullsFirstEffective)

  test("ANSI renders explicit placement for all four combinations") {
    assert(render(Order.asc("c"), Dialect.Ansi) === "\"c\" NULLS FIRST")
    assert(render(Order.desc("c"), Dialect.Ansi) === "\"c\" DESC NULLS LAST")
    assert(render(Order.ascNullsLast("c"), Dialect.Ansi) === "\"c\" NULLS LAST")
    assert(render(Order.descNullsFirst("c"), Dialect.Ansi) === "\"c\" DESC NULLS FIRST")
  }

  test("MySQL: native placements render plain, non-native get the IS NULL prefix key") {
    // native: NULL lowest — first on ASC, last on DESC
    assert(render(Order.asc("c"), Dialect.MySql) === "\"c\"")
    assert(render(Order.desc("c"), Dialect.MySql) === "\"c\" DESC")
    assert(render(Order.ascNullsLast("c"), Dialect.MySql) === "(\"c\" IS NULL) ASC, \"c\"")
    assert(render(Order.descNullsFirst("c"), Dialect.MySql) === "(\"c\" IS NULL) DESC, \"c\" DESC")
  }

  test("Extract/DateTrunc validate their parameters at construction") {
    assertThrows[IllegalArgumentException](ScalarFn.Extract("century"))
    assertThrows[IllegalArgumentException](ScalarFn.DateTrunc("fortnight"))
    assert(SqlRenderer.columnExpr(Fn(ScalarFn.Extract("year"), Seq(Col("d"))))
      === "CAST(EXTRACT(YEAR FROM \"d\") AS BIGINT)")
    assert(SqlRenderer.columnExpr(Fn(ScalarFn.DateTrunc("month"), Seq(Col("d"))))
      === "CAST(DATE_TRUNC('month', \"d\") AS TIMESTAMP)")
  }
}
