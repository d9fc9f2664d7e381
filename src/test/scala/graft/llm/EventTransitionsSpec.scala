package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transition-matrix counts vs a hand walk: per-user adjacency only,
  * total (ts, id) order, tie-break determinism, null contract.
  */
class EventTransitionsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_n", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(ts_n)").as("ts"),
        col("user_id"), col("event_type"))

  test("counts consecutive pairs per user, never across users") {
    val got = EventWindows.eventTransitions(ev(
        (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "buy"),
        (4L, 10L, 2L, "view"), (5L, 20L, 2L, "click")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("view", "click") -> 2L, ("click", "buy") -> 1L))
  }

  test("equal timestamps break ties on event id (total order)") {
    val got = EventWindows.eventTransitions(ev(
        (2L, 10L, 1L, "b"), (1L, 10L, 1L, "a"), (3L, 10L, 1L, "c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("single-event users contribute nothing; result partitioning-independent") {
    val rows = (1L to 120L).map { i =>
      (i, (i * 37) % 50, i % 10, Seq("v", "c", "p")((i % 3).toInt))
    }
    val base = ev(rows: _*)
    val one = EventWindows.eventTransitions(base.repartition(1))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val many = EventWindows.eventTransitions(base.repartition(7))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(one === many && one.values.sum === (120L - 10L))
  }

  test("bounded prefix equals the unbounded matrix when maxEvents covers every user") {
    val rows = (1L to 120L).map { i =>
      (i, (i * 37) % 50, i % 10, Seq("v", "c", "p")((i % 3).toInt))
    }
    val base = ev(rows: _*)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(EventWindows.eventTransitions(base, maxEvents = 100)) ===
      m(EventWindows.eventTransitions(base)))
  }

  test("bounded prefix truncates: only the first maxEvents per user contribute") {
    val got = EventWindows.eventTransitions(ev(
        (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "c"), (4L, 40L, 1L, "d")),
        maxEvents = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L)) // (c,d) cut
  }

  test("NULL event types: bounded and unbounded paths agree (pairs ending in NULL drop)") {
    val rows = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, null.asInstanceOf[String]), (3L, 30L, 1L, "b"))
    val base = ev(rows: _*)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    val unbounded = m(EventWindows.eventTransitions(base))
    val bounded = m(EventWindows.eventTransitions(base, maxEvents = 10))
    assert(unbounded == Map((None, "b") -> 1L)) // (a,NULL) drops, (NULL,b) stays
    assert(bounded == unbounded)
  }

  test("transitionProbs: rows sum to ~SCALE per from_type, exact quantized division") {
    val got = EventWindows.transitionProbs(ev(
        (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "a"),
        (4L, 40L, 1L, "c"), (5L, 50L, 1L, "a"), (6L, 60L, 1L, "b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // from a: ->b twice, ->c once (totals 3); from b: ->a once (b at stream
    // end contributes no pair); from c: ->a once
    assert(got(("a", "b")) == ((2L, 666666L)))
    assert(got(("a", "c")) == ((1L, 333333L)))
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got(("c", "a")) == ((1L, 1000000L)))
  }

  test("whale user stays bounded: partial FirstK agg, no window sort") {
    // one user with 30k events across 4 partitions: the bounded path must
    // reduce each partition to <= maxEvents triples map-side
    val rows = (1L to 30000L).map(i => (i, i, 1L, Seq("v", "c")((i % 2).toInt)))
    val q = EventWindows.eventTransitions(ev(rows: _*).repartition(4), maxEvents = 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(plan.contains("partial_firstkbykey") || plan.contains("FirstK"), plan)
    val got = q.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // first 5 events are ids 1..5 -> types v c v c v
    assert(got === Map(("v", "c") -> 2L, ("c", "v") -> 2L))
  }
}
