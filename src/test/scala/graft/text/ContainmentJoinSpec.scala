package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Containment-join contracts: the quote-in-page case Jaccard misses,
  * threshold exactness, equal-size pairs, and the no-cartesian plan.
  */
class ContainmentJoinSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame,
                    num: Long, den: Long) =
    ContainmentJoin.selfJoin(df, "doc_id", "text", n = 3, minNum = num, minDen = den)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("a short quote inside a long page: containment finds it, Jaccard does not") {
    val quote = "the five boxing wizards jump quickly at dawn"
    val page = ("unrelated filler words across many tokens " * 8) + quote +
      " and then much more trailing content follows here to the end"
    val df = Seq((1L, quote), (2L, page)).toDF("doc_id", "text")
    val got = pairs(df, 9, 10)
    assert(got.contains((1L, 2L)), s"containment pair missing: $got")
    // the same pair fails a Jaccard-1/2 join (tiny overlap fraction of the page)
    val jac = JaccardJoin.selfJoin(df, "doc_id", "text", n = 3)
      .collect()
    assert(jac.isEmpty)
  }

  test("threshold is exact: inter/min below tau excluded, at tau included") {
    // A: 4 trigrams (6 tokens: a b c d e f -> abc bcd cde def)
    // B shares exactly 3 of them plus noise -> containment 3/4
    val a = "a b c d e f"
    val b = "a b c d e x y z w v u t"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(pairs(df, 3, 4).contains((1L, 2L)))  // 3/4 >= 3/4
    assert(!pairs(df, 4, 5).contains((1L, 2L))) // 3/4 < 4/5
  }

  test("equal-size identical docs reach containment 1") {
    val df = Seq((1L, "p q r s t u"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val got = pairs(df, 1, 1)
    assert(got((1L, 2L))._1 == got((1L, 2L))._2)
  }

  test("dropContained removes the quote, keeps the page; chains drop in one pass") {
    val quote = "the five boxing wizards jump quickly at dawn"
    val page = ("filler words here across quite many tokens " * 8) + quote +
      " and then much more trailing content follows to the end"
    val df = Seq((1L, quote), (2L, page), (3L, "fully unrelated text about joins"))
      .toDF("doc_id", "text")
    val kept = ContainmentJoin.dropContained(df, "doc_id", "text", n = 3,
        minNum = 9, minDen = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("plan: no cartesian; candidates keyed on the shingle fingerprint") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val plan = ContainmentJoin.selfJoin(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
