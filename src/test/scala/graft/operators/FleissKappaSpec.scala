package graft.operators

import graft.SparkSpec

class FleissKappaSpec extends SparkSpec {
  import spark.implicits._

  test("hand panel: 4 items x 3 raters, kappa = 1/3 exactly") {
    val ratings = Seq(
      (1, "a"), (1, "a"), (1, "a"),
      (2, "a"), (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "b"),
      (4, "b"), (4, "b"), (4, "b")).toDF("item", "cat")
    val got = FleissKappa.kappa(ratings, "item", "cat").head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((4L, 3L, 333333L)))
  }

  test("perfect agreement across used categories = exactly 1e6; vacuous one-category = NULL") {
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b")).toDF("item", "cat")
    assert(FleissKappa.kappa(perfect, "item", "cat").head().getLong(2) == 1000000L)
    val vacuous = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("item", "cat")
    assert(FleissKappa.kappa(vacuous, "item", "cat").head().isNullAt(2))
  }

  test("worse-than-chance panels go negative") {
    // 2 raters always split: P_i = 0 for every item -> kappa < 0
    val split = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (3, "a"))
      .toDF("item", "cat")
    val k = FleissKappa.kappa(split, "item", "cat").head().getLong(2)
    assert(k < 0, s"kappa = $k")
  }

  test("contracts: unbalanced panel and single-rater panels raise; NULL rows drop") {
    val unbalanced = Seq((1, "a"), (1, "b"), (2, "a")).toDF("item", "cat")
    val ex = intercept[Exception](
      FleissKappa.kappa(unbalanced, "item", "cat").collect())
    assert(ex.getMessage.contains("balanced panel"))
    val single = Seq((1, "a"), (2, "b")).toDF("item", "cat")
    val ex2 = intercept[Exception](
      FleissKappa.kappa(single, "item", "cat").collect())
    assert(ex2.getMessage.contains("at least 2 raters"))
    val withNulls = Seq((Some(1), Some("a")), (Some(1), Some("b")),
      (Some(1), None), (None, Some("a"))).toDF("item", "cat")
    assert(FleissKappa.kappa(withNulls, "item", "cat").head().getLong(0) == 1L)
  }
}
