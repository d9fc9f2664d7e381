package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RRF fusion: hand-checked quantized scores, consensus-beats-solo
  * behavior, malformed-candidate rejection, and the partial-agg plan.
  */
class RankFusionSpec extends SparkSpec {

  import spark.implicits._

  private def q(rank: Long, k: Long = 60L): Long = RankFusion.Scale / (k + rank)

  test("hand-checked fusion of two systems") {
    val a = Seq(("q1", "x", 1L), ("q1", "y", 3L)).toDF("q", "d", "r")
    val b = Seq(("q1", "y", 2L), ("q1", "z", 1L)).toDF("q", "d", "r")
    val got = RankFusion.rrf(Seq(a, b), "q", "d", "r")
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => t._2 -> (t._3, t._4, t._5)).toMap
    assert(got("x") === ((1L, 1L, q(1))))
    assert(got("y") === ((2L, 2L, q(3) + q(2))))
    assert(got("z") === ((1L, 1L, q(1))))
    // consensus mid-ranks beat a solo #1 under k=60 damping
    assert(got("y")._3 > got("x")._3)
  }

  test("a doc surfaced by one deep system only contributes its damped term") {
    val a = Seq(("q1", "deep", 1000L)).toDF("q", "d", "r")
    val got = RankFusion.rrf(Seq(a), "q", "d", "r")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(got._5 === RankFusion.Scale / 1060L)
  }

  test("malformed candidates (rank < 1 or NULL doc) fail loudly") {
    val bad = Seq(("q1", "x", 0L)).toDF("q", "d", "r")
    val e = intercept[Exception] {
      RankFusion.rrf(Seq(bad), "q", "d", "r").collect()
    }
    assert(e.getMessage != null)
    val nullDoc = Seq(("q1", Option.empty[String], 1L)).toDF("q", "d", "r")
    intercept[Exception] { RankFusion.rrf(Seq(nullDoc), "q", "d", "r").collect() }
  }

  test("duplicate (query, doc) within ONE system fails loudly, not as consensus") {
    val dup = Seq(("q1", "x", 1L), ("q1", "x", 2L)).toDF("q", "d", "r")
    intercept[Exception] { RankFusion.rrf(Seq(dup), "q", "d", "r").collect() }
    // the same pair across DIFFERENT systems is legitimate consensus
    val a = Seq(("q1", "x", 1L)).toDF("q", "d", "r")
    val ok = RankFusion.rrf(Seq(a, a), "q", "d", "r")
      .as[(String, String, Long, Long, Long)].collect().head
    assert(ok._3 === 2L)
  }

  test("plan: one partial-agg'd shuffle over the candidate union") {
    val a = Seq(("q1", "x", 1L)).toDF("q", "d", "r")
    val plan = RankFusion.rrf(Seq(a, a), "q", "d", "r")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_min")
      || plan.contains("partial_sum"))
  }

  test("partitioning-independent") {
    val sysA = (1 to 100).map(i => ("q" + (i % 3), s"d$i", (i % 17 + 1).toLong))
      .toDF("q", "d", "r")
    val sysB = (1 to 100).map(i => ("q" + (i % 3), s"d${101 - i}", (i % 11 + 1).toLong))
      .toDF("q", "d", "r")
    val one = RankFusion.rrf(Seq(sysA.coalesce(1), sysB.coalesce(1)), "q", "d", "r")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val many = RankFusion.rrf(Seq(sysA.repartition(8), sysB.repartition(8)), "q", "d", "r")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(one === many)
  }
}
