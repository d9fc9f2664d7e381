package graft.operators

import graft.SparkSpec

/** Best split: a perfect separator, hand-checked quantized impurities
  * with the smaller-threshold tie rule, duplicate-value cells, the 0/1
  * label raise, single-value and NULL strata.
  */
class BestSplitSpec extends SparkSpec {

  import spark.implicits._

  test("a perfectly separable feature reaches split gini 0") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L), ("g", 4L, 1L))
      .toDF("grp", "x", "y")
    val r = BestSplit.giniStump(df, "grp", "x", "y").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 2000000L)  // parent: 8/4
    assert(r.getLong(4) == 2L)        // threshold
    assert(r.getLong(5) == 2L && r.getLong(6) == 0L)
    assert(r.getLong(7) == 0L)
  }

  test("ties on impurity break toward the smaller threshold") {
    // alternating labels: t=1 and t=3 tie at floor(4/3 * 1e6); t=2 is worse
    val df = Seq(("g", 1L, 0L), ("g", 2L, 1L), ("g", 3L, 0L), ("g", 4L, 1L))
      .toDF("grp", "x", "y")
    val r = BestSplit.giniStump(df, "grp", "x", "y").head()
    assert(r.getLong(4) == 1L)
    assert(r.getLong(7) == 1333333L)
  }

  test("duplicate feature values collapse into one candidate cell") {
    val df = Seq(("g", 1L, 1L), ("g", 1L, 0L), ("g", 2L, 0L))
      .toDF("grp", "x", "y")
    val r = BestSplit.giniStump(df, "grp", "x", "y").head()
    assert(r.getLong(4) == 1L && r.getLong(5) == 2L && r.getLong(6) == 1L)
    assert(r.getLong(7) == 1000000L) // left gini-num 2 over nl 2
  }

  test("a non-0/1 label raises in-plan") {
    val df = Seq(("g", 1L, 2L)).toDF("grp", "x", "y")
    val e = intercept[Exception] {
      BestSplit.giniStump(df, "grp", "x", "y").collect()
    }
    assert(e.getMessage.contains("label must be 0/1"))
  }

  test("a single distinct feature value has no candidate: NULL split") {
    val df = Seq(("g", 7L, 0L), ("g", 7L, 1L)).toDF("grp", "x", "y")
    val r = BestSplit.giniStump(df, "grp", "x", "y").head()
    assert(r.getLong(1) == 2L && r.isNullAt(4) && r.isNullAt(7))
    assert(r.getLong(3) == 1000000L) // parent gini 2/2
  }

  test("NULL groups are real strata; NULL feature/label rows drop") {
    val df = Seq((Some("g"), Some(1L), Some(0L)), (Some("g"), Some(2L), Some(1L)),
      (None, Some(1L), Some(0L)), (None, Some(2L), Some(1L)),
      (Some("g"), None, Some(1L)), (Some("g"), Some(9L), None))
      .toDF("grp", "x", "y")
    val got = BestSplit.giniStump(df, "grp", "x", "y").collect()
    assert(got.length == 2 && got.forall(_.getLong(7) == 0L))
  }
}
