package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Interval-set difference: hand sweeps incl. half-overlapping and
  * outside exclusions, overlapping base union, exact-cancel, minus-only
  * keys.
  */
class IntervalSubtractSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def df(rows: (String, Long, Long)*) =
    rows.toSeq.map { case (k, f, t) => (k, ts(f), ts(t)) }
      .toDF("k", "f", "t")

  private def net(base: Seq[(String, Long, Long)],
                  minus: Seq[(String, Long, Long)]) =
    IntervalCoverage.subtractCoverage(df(base: _*), df(minus: _*),
      "k", "f", "t")
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_base"),
        r.getAs[Long]("n_minus"), r.getAs[Long]("net_us"))).toSet

  test("exclusion inside, half-overlapping, and outside the base") {
    // base [0,10): minus [3,5) inside -> 8s; [8,12) half-in -> loses 2s
    // more; [20,25) outside -> no effect
    val got = net(Seq(("g", 0L, 10L)),
      Seq(("g", 3L, 5L), ("g", 8L, 12L), ("g", 20L, 25L)))
    assert(got == Set(("g", 1L, 3L, 6L * 1000000L)))
  }

  test("overlapping base intervals union before subtracting") {
    // base [0,10) u [5,15) = 15s; minus [8,12) -> 11s
    val got = net(Seq(("g", 0L, 10L), ("g", 5L, 15L)),
      Seq(("g", 8L, 12L)))
    assert(got == Set(("g", 2L, 1L, 11L * 1000000L)))
  }

  test("exact cancellation and a minus-only key") {
    val got = net(Seq(("a", 0L, 10L)),
      Seq(("a", 0L, 10L), ("z", 1L, 4L)))
    assert(got == Set(("a", 1L, 1L, 0L), ("z", 0L, 1L, 0L)))
  }

  test("empty minus leaves the union length") {
    val got = net(Seq(("g", 0L, 4L), ("g", 4L, 7L)), Seq.empty)
    assert(got == Set(("g", 2L, 0L, 7L * 1000000L)))
  }
}
