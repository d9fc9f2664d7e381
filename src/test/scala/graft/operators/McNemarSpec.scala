package graft.operators

import graft.SparkSpec

class McNemarSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: discordant 6 vs 2 gives chi2 = 2.0 exactly") {
    val pairs = (Seq.fill(5)((1L, 1L)) ++ Seq.fill(6)((1L, 0L)) ++
      Seq.fill(2)((0L, 1L)) ++ Seq.fill(3)((0L, 0L)))
      .map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b")
    val got = McNemar.test(pairs, "g", "a", "b").head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4)) ==
      ((16L, 6L, 2L, 2000000L)))
  }

  test("no discordant pairs = NULL statistic; symmetric discordance = 0") {
    val same = Seq(("g", 1L, 1L), ("g", 0L, 0L)).toDF("g", "a", "b")
    assert(McNemar.test(same, "g", "a", "b").head().isNullAt(4))
    val sym = Seq(("g", 1L, 0L), ("g", 0L, 1L)).toDF("g", "a", "b")
    assert(McNemar.test(sym, "g", "a", "b").head().getLong(4) == 0L)
  }

  test("contracts: non-binary outcome raises; NULLs drop; NULL group is a stratum") {
    val bad = Seq(("g", 2L, 1L)).toDF("g", "a", "b")
    val ex = intercept[Exception](McNemar.test(bad, "g", "a", "b").collect())
    assert(ex.getMessage.contains("must be 0 or 1"))
    val mixed = Seq((Some("g"), Some(1L), Some(0L)),
      (Some("g"), Option.empty[Long], Some(1L)),
      (Option.empty[String], Some(0L), Some(1L))).toDF("g", "a", "b")
    val got = McNemar.test(mixed, "g", "a", "b").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
