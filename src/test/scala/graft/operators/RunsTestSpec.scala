package graft.operators

import graft.SparkSpec

/** Wald–Wolfowitz runs test: hand moments on alternating and streaky
  * series, the classical tie-drop rule, one-sided NULL moments, the
  * duplicate-idx raise, NULL-group stratum.
  */
class RunsTestSpec extends SparkSpec {

  import spark.implicits._

  test("alternating series: 6 runs, exact null moments") {
    val df = (1L to 6L).map(i => ("g", i, if (i % 2 == 1) 10L else 1L))
      .toDF("grp", "i", "v")
    val r = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L) // n1, n2
    assert(r.getLong(3) == 6L)                        // saw-tooth: max runs
    // mean = 1 + 2*3*3/6 = 4; var = 2*9*(18-6)/(36*5) = 1.2
    assert(r.getLong(4) == 4000000L)
    assert(r.getLong(5) == 1200000L)
  }

  test("streaky series has 2 runs under the same moments") {
    val df = (1L to 6L).map(i => ("g", i, if (i <= 3) 10L else 1L))
      .toDF("grp", "i", "v")
    val r = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).head()
    assert(r.getLong(3) == 2L)
    assert(r.getLong(4) == 4000000L && r.getLong(5) == 1200000L)
  }

  test("values equal to the threshold drop before dichotomizing") {
    // 10,5,1,5,10 at threshold 5 -> kept 10,1,10 = 3 runs, n1=2, n2=1
    val df = Seq(("g", 1L, 10L), ("g", 2L, 5L), ("g", 3L, 1L),
      ("g", 4L, 5L), ("g", 5L, 10L)).toDF("grp", "i", "v")
    val r = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    // mean = 1 + 2*2*1/3 = 7/3 -> 2333333 (trunc)
    assert(r.getLong(4) == 2333333L)
    // var = 2*2*1*(4-3)/(9*2) = 4/18 -> 222222
    assert(r.getLong(5) == 222222L)
  }

  test("a one-sided sequence publishes its run count with NULL moments") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L))
      .toDF("grp", "i", "v")
    val r = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).head()
    assert(r.getLong(3) == 1L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("duplicate surviving indexes raise in-plan") {
    val df = Seq(("g", 1L, 10L), ("g", 1L, 1L), ("g", 2L, 10L))
      .toDF("grp", "i", "v")
    val ex = intercept[Exception] {
      RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).collect()
    }
    assert(ex.getMessage.contains("duplicate idx"))
  }

  test("a tie-dropped row can clear a duplicate index (drop runs first)") {
    // i=1 appears twice but one copy IS the threshold -> dropped, no raise
    val df = Seq(("g", 1L, 10L), ("g", 1L, 5L), ("g", 2L, 1L))
      .toDF("grp", "i", "v")
    val r = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).head()
    assert(r.getLong(3) == 2L)
  }

  test("a NULL group is a real stratum; NULL idx/value rows drop") {
    val df = Seq((Some("g"), Some(1L), Some(10L)),
      (Some("g"), Some(2L), Some(1L)),
      (None, Some(1L), Some(10L)), (None, Some(2L), Some(1L)),
      (Some("g"), None, Some(7L)), (Some("g"), Some(9L), None))
      .toDF("grp", "i", "v")
    val got = RunsTest.runsTest(df, "grp", "i", "v", threshold = 5L).collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
    assert(got.forall(_.getLong(3) == 2L))
  }
}
