package graft.operators

import graft.SparkSpec

/** Peak concurrency: sweep max, earliest-peak election, half-open
  * endpoint rule, degenerate/NULL contracts.
  */
class ConcurrencySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  test("three staggered intervals peak at 3 at the third start") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:40:00")),
      (1L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:50:00"))
    ).toDF("k", "f", "t")
    val got = Concurrency.peak(df, "k", "f", "t").head()
    assert(got.getLong(1) == 3L)
    assert(got.getLong(2) == 3L)
    assert(got.getLong(3) == us("2024-01-01 00:20:00"))
  }

  test("back-to-back intervals never overlap ([a,b) endpoint rule)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00"))
    ).toDF("k", "f", "t")
    val got = Concurrency.peak(df, "k", "f", "t").head()
    assert(got.getLong(2) == 1L)
    // peak of 1 is first reached at the very first start
    assert(got.getLong(3) == us("2024-01-01 00:00:00"))
  }

  test("earliest instant wins when the peak recurs") {
    val df = Seq(
      // two overlap at [5,10), then again at [20,25)
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:15:00")),
      (1L, ts("2024-01-01 00:18:00"), ts("2024-01-01 00:25:00")),
      (1L, ts("2024-01-01 00:20:00"), ts("2024-01-01 00:30:00"))
    ).toDF("k", "f", "t")
    val got = Concurrency.peak(df, "k", "f", "t").head()
    assert(got.getLong(2) == 2L)
    assert(got.getLong(3) == us("2024-01-01 00:05:00"))
  }

  test("degenerate and NULL intervals carry no occupancy; keys independent") {
    val df = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-01 00:00:00"))),
      (1L, None, Some(ts("2024-01-01 02:00:00"))),
      (1L, Some(ts("2024-01-01 03:00:00")), Some(ts("2024-01-01 03:30:00"))),
      (2L, Some(ts("2024-01-01 03:00:00")), Some(ts("2024-01-01 03:30:00"))),
      (2L, Some(ts("2024-01-01 03:10:00")), Some(ts("2024-01-01 03:20:00")))
    ).toDF("k", "f", "t")
    val got = Concurrency.peak(df, "k", "f", "t").orderBy("k").collect()
    assert(got.length == 2)
    assert((got(0).getLong(1), got(0).getLong(2)) == ((1L, 1L)))
    assert((got(1).getLong(1), got(1).getLong(2)) == ((2L, 2L)))
    assert(got(1).getLong(3) == us("2024-01-01 03:10:00"))
  }
}
