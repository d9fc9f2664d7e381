package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Linkage contracts: hand-checked agreement weights, null-safe field
  * semantics, blocking (no cross-block pairs, no cartesian), threshold,
  * and the hash-join plan shape.
  */
class RecordLinkageSpec extends SparkSpec {

  import spark.implicits._
  import RecordLinkage.FieldCompare

  private val crm = Seq(
    (1L, "uk", "alice", "a@x.com"),
    (2L, "uk", "bob", null.asInstanceOf[String]),
    (3L, "de", "carla", "c@x.com")
  ).toDF("crm_id", "country", "name", "email")

  private val billing = Seq(
    (10L, "uk", "alice", "a@x.com"),   // exact match of 1
    (20L, "uk", "bob", null.asInstanceOf[String]),  // matches 2 incl. null email
    (30L, "uk", "alice", "other@y.org"),            // name-only match of 1
    (40L, "de", "alice", "a@x.com")                 // other block: never pairs with 1
  ).toDF("bill_id", "country", "name", "email")

  private def link(minScore: Long) = RecordLinkage.score(
    crm, billing, blockOn = Seq("country" -> "country"),
    fields = Seq(FieldCompare("name", "name", 4L, -2L),
      FieldCompare("email", "email", 6L, -3L)),
    aKey = "crm_id", bKey = "bill_id", minScore = minScore)
    .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("hand-checked scores: agreement sums, null-safe equality, blocking") {
    val got = link(Long.MinValue)
    assert(got((1L, 10L)) == 10L) // name + email agree
    assert(got((1L, 30L)) == 1L)  // name agrees (4), email disagrees (-3)
    assert(got((2L, 20L)) == 10L) // NULL email agrees with NULL (null-safe)
    assert(got((2L, 10L)) == -5L) // nothing agrees (null vs value disagrees)
    assert(!got.contains((1L, 40L)), "cross-block pair must not exist")
    assert(got((3L, 40L)) == -5L) // de block pairs, but name AND email disagree
  }

  test("threshold keeps only confident pairs") {
    assert(link(10L).keySet == Set((1L, 10L), (2L, 20L)))
  }

  test("plan: hash join on the blocking key, never a nested loop") {
    val plan = RecordLinkage.score(crm, billing, Seq("country" -> "country"),
        Seq(FieldCompare("name", "name", 1L, 0L)), "crm_id", "bill_id", 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), plan)
  }

  test("whale-block salting: result identical to unsalted on a one-block-heavy corpus") {
    // one block ("uk") holds nearly every record — the salting target
    val aBig = (1L to 200L).map(i =>
      (i, if (i <= 190) "uk" else "de", s"name${i % 13}", s"e${i % 7}@x.com"))
      .toDF("crm_id", "country", "name", "email")
    val bBig = (1000L to 1150L).map(i =>
      (i, if (i <= 1140) "uk" else "fr", s"name${i % 13}", s"e${i % 7}@x.com"))
      .toDF("bill_id", "country", "name", "email")
    def run(buckets: Int) = RecordLinkage.score(
      aBig, bBig, Seq("country" -> "country"),
      Seq(FieldCompare("name", "name", 4L, -2L),
        FieldCompare("email", "email", 6L, -3L)),
      "crm_id", "bill_id", minScore = 4L, saltBuckets = buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unsalted = run(1)
    assert(unsalted.nonEmpty)
    assert(run(8) == unsalted, "salting must never change the pair set")
    // salted hand-checked case too (nulls, blocking, threshold all live)
    val salted = RecordLinkage.score(crm, billing, Seq("country" -> "country"),
      Seq(FieldCompare("name", "name", 4L, -2L),
        FieldCompare("email", "email", 6L, -3L)),
      "crm_id", "bill_id", Long.MinValue, saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(salted == link(Long.MinValue))
  }

  test("unblocked linkage is refused") {
    intercept[IllegalArgumentException] {
      RecordLinkage.score(crm, billing, Nil,
        Seq(FieldCompare("name", "name", 1L, 0L)), "crm_id", "bill_id", 0L)
    }
  }
}
