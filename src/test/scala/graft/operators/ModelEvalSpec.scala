package graft.operators

import graft.SparkSpec

/** Classification eval: the textbook 2×2 kappa case, per-class report
  * numbers, worse-than-chance negativity, vacuous-agreement NULL, and
  * one-sided classes.
  */
class ModelEvalSpec extends SparkSpec {

  import spark.implicits._

  // 20 a/a, 5 a/b, 10 b/a, 15 b/b — po = 0.7, pe = 0.5, kappa = 0.4
  private def square = (
    Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
    Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
  ).toDF("t", "p")

  test("kappa: textbook 2x2 case is exactly 0.4") {
    val r = ModelEval.cohensKappa(square, "t", "p").collect().head
    assert(r.getAs[Long]("n") == 50L && r.getAs[Long]("agree") == 35L)
    assert(r.getAs[Long]("kappa_q6") == 400000L)
  }

  test("class report: per-class tp/fp/fn and quantized P/R/F1") {
    val got = ModelEval.classReport(square, "t", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("tp") == 20L && a.getAs[Long]("fp") == 10L &&
      a.getAs[Long]("fn") == 5L && a.getAs[Long]("support") == 25L)
    assert(a.getAs[Long]("precision_q6") == 666666L)
    assert(a.getAs[Long]("recall_q6") == 800000L)
    assert(a.getAs[Long]("f1_q6") == 727272L)
    val b = got("b")
    assert(b.getAs[Long]("precision_q6") == 750000L)
    assert(b.getAs[Long]("recall_q6") == 600000L)
    assert(b.getAs[Long]("f1_q6") == 666666L)
  }

  test("perfect disagreement is kappa -1; constant agreement is NULL") {
    val flipped = (Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "a")))
      .toDF("t", "p")
    assert(ModelEval.cohensKappa(flipped, "t", "p")
      .collect().head.getAs[Long]("kappa_q6") == -1000000L)
    val constant = Seq.fill(4)(("a", "a")).toDF("t", "p")
    val r = ModelEval.cohensKappa(constant, "t", "p").collect().head
    assert(r.isNullAt(r.fieldIndex("kappa_q6")))
  }

  test("a never-predicted class has NULL precision but a real recall row") {
    val df = Seq(("a", "a"), ("c", "a")).toDF("t", "p")
    val got = ModelEval.classReport(df, "t", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    val c = got("c")
    assert(c.getAs[Long]("tp") == 0L && c.getAs[Long]("fn") == 1L)
    assert(c.isNullAt(c.fieldIndex("precision_q6")))
    assert(c.getAs[Long]("recall_q6") == 0L)
    assert(c.getAs[Long]("f1_q6") == 0L)
  }
}
