package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Path-mining contracts: hand-checked k-gram counts, prefix cut, user
  * counting, deterministic top-N ties, whale boundedness, plan shape.
  */
class EventPathsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_n", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(ts_n)").as("ts"),
        col("user_id"), col("event_type"))

  test("hand-checked: occurrences and distinct users per path") {
    val got = EventPaths.topPaths(ev(
        (1L, 10L, 1L, "v"), (2L, 20L, 1L, "c"), (3L, 30L, 1L, "b"),
        (4L, 10L, 2L, "v"), (5L, 20L, 2L, "c"), (6L, 30L, 2L, "b"),
        (7L, 10L, 3L, "v"), (8L, 20L, 3L, "x")),
        pathLen = 3, maxEvents = 10, topN = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("v>c>b" -> ((2L, 2L))))
  }

  test("repeated path within one user: n_occ counts all, n_users once") {
    val got = EventPaths.topPaths(ev(
        (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"),
        (3L, 30L, 1L, "a"), (4L, 40L, 1L, "b")),
        pathLen = 2, maxEvents = 10, topN = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a>b" -> ((2L, 1L)), "b>a" -> ((1L, 1L))))
  }

  test("the prefix cut bounds which events form paths") {
    val got = EventPaths.topPaths(ev(
        (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "c"), (4L, 40L, 1L, "d")),
        pathLen = 2, maxEvents = 3, topN = 10)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a>b", "b>c")) // c>d beyond the cut
  }

  test("a NULL event type nulls its grams, which drop (no NULL path rows)") {
    val got = EventPaths.topPaths(ev(
        (1L, 10L, 1L, "a"), (2L, 20L, 1L, null.asInstanceOf[String]), (3L, 30L, 1L, "b")),
        pathLen = 2, maxEvents = 10, topN = 10)
      .collect().map(_.getString(0)).toSet
    assert(got == Set.empty[String]) // both grams touch the NULL step
  }

  test("top-N ties break on path asc; whale user stays partial-agg'd") {
    val rows = (1L to 10000L).map(i =>
      (i, i, 1L, Seq("p", "q")((i % 2).toInt))) // one whale user
    val q = EventPaths.topPaths(ev(rows: _*).repartition(4),
      pathLen = 2, maxEvents = 6, topN = 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // first 6 events: q p q p q p -> q>p x3, p>q x2; top-1 = q>p
    assert(got == Seq(("q>p", 3L)))
  }
}
