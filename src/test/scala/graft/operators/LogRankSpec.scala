package graft.operators

import graft.SparkSpec

/** Log-rank: hand O/E/V chain with censoring, identical-arms zero
  * difference, event-flag guard, third-arm drop.
  */
class LogRankSpec extends SparkSpec {

  import spark.implicits._

  test("hand components with a censored subject") {
    val df = Seq(("a", 1L, 1L), ("a", 3L, 1L), ("b", 2L, 1L),
      ("b", 3L, 0L)).toDF("arm", "dur", "ev")
    val r = LogRank.logRank(df, "arm", "dur", "ev", "a", "b").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("o_a") == 2L && r.getAs[Long]("o_b") == 1L)
    assert(r.getAs[Long]("e_a_q6") == 1333333L) // 500000+333333+500000
    assert(r.getAs[Long]("var_q6") == 722222L)  // 250000+222222+250000
    assert(r.getAs[Long]("n_event_times") == 3L)
  }

  test("identical arms observe exactly their expectation") {
    val df = Seq(("a", 5L, 1L), ("b", 5L, 1L)).toDF("arm", "dur", "ev")
    val r = LogRank.logRank(df, "arm", "dur", "ev", "a", "b").head()
    assert(r.getAs[Long]("o_a") * 1000000L == r.getAs[Long]("e_a_q6"))
  }

  test("non-0/1 event flags raise; other arms drop silently") {
    val bad = Seq(("a", 1L, 2L), ("b", 1L, 1L)).toDF("arm", "dur", "ev")
    val e = intercept[Exception] {
      LogRank.logRank(bad, "arm", "dur", "ev", "a", "b").collect()
    }
    assert(e.getMessage.contains("must be 0/1"))
    val three = Seq(("a", 1L, 1L), ("b", 2L, 1L), ("c", 9L, 1L))
      .toDF("arm", "dur", "ev")
    val r = LogRank.logRank(three, "arm", "dur", "ev", "a", "b").head()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 2L)
  }
}
