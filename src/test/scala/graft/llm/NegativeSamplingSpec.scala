package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Negative-pair sampling: coverage, self-exclusion, determinism, and the
  * hash-uniformity smoke check.
  */
class NegativeSamplingSpec extends SparkSpec {

  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(i => i.toLong * 10).toDF("id")

  test("every anchor gets exactly k negatives, none of them itself") {
    val got = NegativeSampling.negativePairs(ids(50), "id", k = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 150)
    assert(got.forall { case (a, _, n) => a != n })
    val perAnchor = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(perAnchor.values.forall(_ === Set(0L, 1L, 2L)))
  }

  test("negatives are existing ids") {
    val all = (1 to 20).map(_.toLong * 10).toSet
    val got = NegativeSampling.negativePairs(ids(20), "id", k = 2)
      .select("neg_id").as[Long].collect()
    assert(got.forall(all.contains))
  }

  test("deterministic and partitioning-independent") {
    val a = NegativeSampling.negativePairs(ids(30).coalesce(1), "id", 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = NegativeSampling.negativePairs(ids(30).repartition(7), "id", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("n = 1: no negative exists, zero pairs") {
    assert(NegativeSampling.negativePairs(ids(1), "id", 5).count() === 0L)
  }

  test("hash partners spread across the corpus (not degenerate)") {
    val got = NegativeSampling.negativePairs(ids(200), "id", k = 2)
      .select("neg_id").as[Long].collect()
    // uniform-ish: no single partner absorbs more than 10% of 400 draws
    val top = got.groupBy(identity).map(_._2.length).max
    assert(top < 40, s"most-hit partner drew $top of 400")
  }

  test("plan: partner resolution is an equi-join, no cartesian over row data") {
    val plan = NegativeSampling.negativePairs(ids(100), "id", 2)
      .queryExecution.executedPlan.toString
    // the only nested-loop is the broadcast of the 1-row count frame; the
    // partner lookup itself must be a hash equi-join on the dense index
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("__nidx"))
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findFirstIn(plan).isDefined)
  }
}
