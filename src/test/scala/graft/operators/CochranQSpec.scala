package graft.operators

import graft.SparkSpec

class CochranQSpec extends SparkSpec {
  import spark.implicits._

  test("hand 3-treatment panel: Q = 3 exactly") {
    val outcomes = Seq(
      (1, "a", 1L), (1, "b", 1L), (1, "c", 0L),
      (2, "a", 1L), (2, "b", 0L), (2, "c", 0L),
      (3, "a", 1L), (3, "b", 1L), (3, "c", 1L),
      (4, "a", 0L), (4, "b", 0L), (4, "c", 0L))
      .map { case (i, t, x) => ("g", i, t, x) }.toDF("g", "item", "treat", "x")
    val got = CochranQ.test(outcomes, "g", "item", "treat", "x").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((4L, 3L, 3000000L)))
  }

  test("k = 2 reduces to the McNemar statistic exactly (identity, not approximation)") {
    val pairs = for (i <- 1 to 60) yield
      ("g", i, if (i % 7 < 4) 1L else 0L, if (i % 11 < 6) 1L else 0L)
    val long = pairs.flatMap { case (g, i, a, b) =>
      Seq((g, i, "A", a), (g, i, "B", b)) }.toDF("g", "item", "treat", "x")
    val q = CochranQ.test(long, "g", "item", "treat", "x").head().getLong(3)
    val mc = McNemar.test(
      pairs.toDF("g", "item", "a", "b"), "g", "a", "b").head().getLong(4)
    assert(q == mc, s"Q=$q vs McNemar=$mc")
  }

  test("no discordance anywhere = NULL; unbalanced and non-binary panels raise") {
    val concordant = Seq(("g", 1, "a", 1L), ("g", 1, "b", 1L),
      ("g", 2, "a", 0L), ("g", 2, "b", 0L)).toDF("g", "item", "treat", "x")
    assert(CochranQ.test(concordant, "g", "item", "treat", "x").head().isNullAt(3))
    val unbalanced = Seq(("g", 1, "a", 1L), ("g", 1, "b", 0L),
      ("g", 2, "a", 1L)).toDF("g", "item", "treat", "x")
    val ex = intercept[Exception](
      CochranQ.test(unbalanced, "g", "item", "treat", "x").collect())
    assert(ex.getMessage.contains("exactly one outcome per treatment"))
    val nonBinary = Seq(("g", 1, "a", 2L), ("g", 1, "b", 0L))
      .toDF("g", "item", "treat", "x")
    val ex2 = intercept[Exception](
      CochranQ.test(nonBinary, "g", "item", "treat", "x").collect())
    assert(ex2.getMessage.contains("outcome must be 0 or 1"))
  }
}
