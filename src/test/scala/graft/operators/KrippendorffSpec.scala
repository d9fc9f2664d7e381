package graft.operators

import graft.SparkSpec

/** Krippendorff alpha: hand coincidence math, perfect/inverse anchors,
  * single-rating drop, vacuous-label NULL, multiplicity bound.
  */
class KrippendorffSpec extends SparkSpec {

  import spark.implicits._

  test("hand three-unit mixed-multiplicity case") {
    // u1 [a,a], u2 [a,b], u3 [b,b,b]: Do = (2/1)/7, De = 24/42 = 4/7,
    // alpha = 1 - (2/7)/(4/7) = 0.5
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b")).toDF("unit", "v")
    val r = Krippendorff.alphaNominal(df, "unit", "v").head()
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Long]("n_ratings") == 7L)
    assert(r.getAs[Long]("alpha_q6") == 500000L)
  }

  test("perfect agreement 1e6; systematic disagreement -0.5; one pair 0") {
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("unit", "v")
    assert(Krippendorff.alphaNominal(perfect, "unit", "v")
      .head().getAs[Long]("alpha_q6") == 1000000L)
    // two disagreeing pairs: Do = 1, De = 8/12 -> alpha = -0.5
    val inverse = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("unit", "v")
    assert(Krippendorff.alphaNominal(inverse, "unit", "v")
      .head().getAs[Long]("alpha_q6") == -500000L)
    // a SINGLE disagreeing pair: De is also 1 -> alpha exactly 0 (the
    // textbook small-sample behavior)
    val single = Seq((1L, "a"), (1L, "b")).toDF("unit", "v")
    assert(Krippendorff.alphaNominal(single, "unit", "v")
      .head().getAs[Long]("alpha_q6") == 0L)
  }

  test("single-rating units drop; a one-label space reports NULL") {
    val df = Seq((1L, "a"), (1L, "a"), (9L, "b")).toDF("unit", "v")
    val r = Krippendorff.alphaNominal(df, "unit", "v").head()
    assert(r.getAs[Long]("n_units") == 1L && r.getAs[Long]("n_ratings") == 2L)
    assert(r.isNullAt(r.fieldIndex("alpha_q6")))
  }

  test("multiplicities above 21 are rejected loudly") {
    val df = (1 to 25).map(i => (1L, s"v$i")).toDF("unit", "v")
    val e = intercept[IllegalArgumentException] {
      Krippendorff.alphaNominal(df, "unit", "v").collect()
    }
    assert(e.getMessage.contains("multiplicities above"))
  }
}
