package graft.exec

import graft.{SparkSpec, Tables}
import graft.adt._
import graft.core.FxType
import org.apache.spark.sql.functions._

class HavingCaseSpec extends SparkSpec {

  private def run(sel: Select) =
    Translator.select(sel, Tables.resolve(spark, sf))

  test("HAVING filters on aggregate aliases and group keys") {
    val sel = Select(
      table = "orders",
      columns = Seq(Col("o_custkey"), CountStar.as("n")),
      groupBy = Seq(Col("o_custkey")),
      having = Some(Cond(Col("n"), CondOp.GreaterEqual(V.i64(3)))))
    val got = run(sel)
    assert(got.where(col("n") < 3).count() === 0)
    // complement check: no qualifying group was dropped
    val all = run(sel.copy(having = None))
    assert(got.count() === all.where(col("n") >= 3).count())
  }

  test("HAVING on a non-aggregate query is rejected") {
    val sel = Select("orders", Seq(Col("o_orderkey")),
      having = Some(Cond(Col("o_orderkey"), CondOp.Greater(V.i64(0)))))
    assertThrows[IllegalArgumentException](run(sel))
  }

  test("rendered HAVING substitutes the alias with the aggregate expression") {
    val sel = Select(
      table = "orders",
      columns = Seq(Col("o_custkey"), CountStar.as("n")),
      groupBy = Seq(Col("o_custkey")),
      having = Some(Cond(Col("n"), CondOp.Greater(V.i64(5)))))
    val sql = SqlRenderer.select(sel)
    assert(sql.contains("HAVING COUNT(*) > 5"), sql)
    assert(!sql.contains("HAVING \"n\""), sql)
  }

  test("CASE first-match-wins order and NULL default") {
    val sel = Select(
      table = "orders",
      columns = Seq(
        Col("o_orderkey"),
        CaseWhen(
          Seq(
            (Cond(Col("o_totalprice"), CondOp.Less(V.f64(100000.0))), Lit(V.str("low"))),
            // overlapping branch — must never win for < 100000
            (Cond(Col("o_totalprice"), CondOp.Less(V.f64(200000.0))), Lit(V.str("mid")))),
          default = None).as("band"),
        Col("o_totalprice")))
    val got = run(sel)
    assert(got.where(col("o_totalprice") < 100000 && col("band") =!= "low").count() === 0)
    assert(got.where(col("o_totalprice") >= 200000 && col("band").isNotNull).count() === 0)
    val sql = SqlRenderer.select(sel)
    assert(sql.contains("CASE WHEN") && sql.contains("END"), sql)
  }

  test("GROUP BY a computed key (CASE band alias) groups on the expression") {
    val band = CaseWhen(
      Seq((Cond(Col("o_totalprice"), CondOp.Less(V.f64(100000.0))), Lit(V.str("low")))),
      default = Some(Lit(V.str("high")))).as("band")
    val sel = Select(
      table = "orders",
      columns = Seq(band, CountStar.as("n")),
      groupBy = Seq(Col("band")))
    val got = run(sel).orderBy("band").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(got("low") === orders.where(col("o_totalprice") < 100000).count())
    assert(got("high") === orders.where(col("o_totalprice") >= 100000).count())
    // rendered SQL groups by the CASE expression, not the alias
    val sql = SqlRenderer.select(sel)
    assert(sql.contains("GROUP BY CASE WHEN"), sql)
  }

  test("conditional aggregation: SUM(CASE …) equals a filtered sum") {
    val dec = FxType.TDecimal(18, 2)
    val sel = Select(
      table = "orders",
      columns = Seq(
        Col("o_orderstatus"),
        Cast(Agg(AggFn.Sum, CaseWhen(
          Seq((Cond(Col("o_orderpriority"), CondOp.Like("1%")),
            Cast(Col("o_totalprice"), dec))),
          default = Some(Cast(Lit(V.i32(0)), dec)))), FxType.TF64).as("urgent")),
      groupBy = Seq(Col("o_orderstatus")))
    val got = run(sel).orderBy("o_orderstatus").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderpriority").like("1%"))
      .groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("u"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    expect.foreach { case (k, v) => assert(got(k) === v) }
  }
}
