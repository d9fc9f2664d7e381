package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Date

/** Trailing-window features vs the self-join definition, tie peers, and
  * the one-exchange plan shape.
  */
class RollingWindowSpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq(
    // (key, date, value)
    (1L, "2024-01-01", 10.0), (1L, "2024-01-15", 20.0), (1L, "2024-02-20", 40.0),
    (1L, "2024-01-15", 5.0), // tied date — frame peer of the other 01-15 row
    (2L, "2024-03-01", 7.0))

  private def df = rows.toDF("k", "d", "v")
    .withColumn("d", col("d").cast("date"))

  test("matches the self-join definition of a 30-day closed trailing window") {
    val got = RollingWindow.trailingByDays(df, "k", "d", "v", windowDays = 30)
      .select("k", "d", "v", "trail_n", "trail_sum")
      .as[(Long, Date, Double, Long, Double)].collect().toSet
    val brute = rows.map { case (k, d, v) =>
      val dd = Date.valueOf(d).toLocalDate
      val in = rows.filter { case (k2, d2, _) =>
        val dd2 = Date.valueOf(d2).toLocalDate
        k2 == k && !dd2.isAfter(dd) && !dd2.isBefore(dd.minusDays(30))
      }
      (k, Date.valueOf(d), v, in.size.toLong, in.map(_._3).sum)
    }.toSet
    assert(got === brute)
  }

  test("tied dates are frame peers: both rows of a tie see the same frame") {
    val tied = RollingWindow.trailingByDays(df, "k", "d", "v", windowDays = 30)
      .where(col("d") === "2024-01-15")
      .select("trail_n", "trail_sum")
      .as[(Long, Double)].collect().toSet
    assert(tied === Set((3L, 35.0))) // 01-01 (10) + both tied 01-15 rows (20 + 5)
  }

  test("windowDays = 0 keeps only same-day peers") {
    val got = RollingWindow.trailingByDays(df, "k", "d", "v", windowDays = 0)
      .where(col("k") === 1L && col("d") === "2024-02-20")
      .select("trail_n").as[Long].head()
    assert(got === 1L)
  }

  test("plan: one hash exchange on the key, no global window") {
    val plan = RollingWindow.trailingByDays(df.repartition(4), "k", "d", "v", 30)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(k".r.findAllIn(plan).size >= 1)
    assert(!plan.contains("SinglePartition"))
  }
}
