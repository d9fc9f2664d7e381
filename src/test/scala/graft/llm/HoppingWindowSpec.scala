package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Hopping windows: coverage factor, tumbling consistency, and the
  * no-self-join plan shape.
  */
class HoppingWindowSpec extends SparkSpec {

  import spark.implicits._

  private def ev(ts: String, t: String, v: Double) =
    (Timestamp.valueOf(ts), t, v)

  private def events = Seq(
    ev("2024-01-01 00:10:00", "a", 1.0),
    ev("2024-01-01 00:50:00", "a", 2.0),
    ev("2024-01-01 01:10:00", "a", 4.0),
    ev("2024-01-01 02:05:00", "b", 8.0)).toDF("ts", "event_type", "value")

  test("every event lands in exactly size/slide windows") {
    val perWindow = EventWindows.hopping(events, size = "2 hours", slide = "1 hour")
      .agg(sum("n_events")).as[Long].head()
    assert(perWindow === events.count() * 2)
  }

  test("a 2h window's count equals the sum of its two 1h tumbling buckets") {
    val tumb = EventWindows.tumbling(events, duration = "1 hour")
      .select(col("w_start"), col("event_type"), col("n_events"))
      .as[(Timestamp, String, Long)].collect()
      .map { case (w, t, n) => (w.getTime, t) -> n }.toMap
    val hop = EventWindows.hopping(events, size = "2 hours", slide = "1 hour")
      .select(col("w_start"), col("event_type"), col("n_events"))
      .as[(Timestamp, String, Long)].collect()
    hop.foreach { case (w, t, n) =>
      val h = 3600L * 1000
      val expect = tumb.getOrElse((w.getTime, t), 0L) +
        tumb.getOrElse((w.getTime + h, t), 0L)
      assert(n === expect, s"window $w type $t")
    }
  }

  test("size = slide degenerates to tumbling") {
    val hop = EventWindows.hopping(events, size = "1 hour", slide = "1 hour")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val tumb = EventWindows.tumbling(events, duration = "1 hour")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(hop === tumb)
  }

  test("plan: Expand + one aggregate exchange, no join") {
    val plan = EventWindows.hopping(events).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Join"))
  }
}
