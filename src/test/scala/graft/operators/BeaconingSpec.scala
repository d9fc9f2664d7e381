package graft.operators

import graft.SparkSpec

/** Beaconing: a metronome flags, a bursty human does not, the exact
  * threshold boundary, insufficient-evidence NULLs, tie gaps.
  */
class BeaconingSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (String, String, Long)*) =
    rows.map { case (u, c, us) => (u, c, us) }.toDF("u", "c", "us")
      .selectExpr("u", "c", "timestamp_micros(us) AS ts")

  private def screen(minGaps: Long = 5L, maxFanoQ6: Long = 100000L)(
      rows: (String, String, Long)*) =
    Beaconing.screen(ev(rows: _*), Seq("u", "c"), "ts", minGaps, maxFanoQ6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

  test("a perfect timer flags at any threshold; var_num is exactly 0") {
    val timer = (0 to 6).map(i => ("bot", "dns", i * 60000000L))
    val r = screen()(timer: _*)(("bot", "dns"))
    assert(r.getLong(2) == 6L)
    assert(r.getString(4) == "0" || r.getString(3) == "0")
    assert(r.getLong(6) == 0L && r.getBoolean(7))
  }

  test("a bursty human pattern does not flag") {
    val human = Seq(0L, 1000000L, 2000000L, 300000000L, 301000000L,
      900000000L, 905000000L).map(us => ("alice", "web", us))
    val r = screen()(human: _*)(("alice", "web"))
    assert(!r.getBoolean(7))
  }

  test("the verdict is exact at the threshold boundary") {
    // gaps 9, 11, 9, 11: n=4, s=40, ss=404: var = 1616-1600 = 16,
    // den = 120 -> fano = 2/15 = 133333 q6. At threshold 133333 the
    // cross-mult 16e6 < 133333*120 = 15999960 is FALSE; at 133334 TRUE
    val rows = Seq(0L, 9L, 20L, 29L, 40L).map(us => ("u", "c", us))
    val lo = screen(minGaps = 4L, maxFanoQ6 = 133333L)(rows: _*)(("u", "c"))
    val hi = screen(minGaps = 4L, maxFanoQ6 = 133334L)(rows: _*)(("u", "c"))
    assert(lo.getLong(6) == 133333L)
    assert(!lo.getBoolean(7) && hi.getBoolean(7))
  }

  test("too few gaps: NULL verdict (insufficient evidence)") {
    val r = screen(minGaps = 5L)(("u", "c", 0L), ("u", "c", 60L),
      ("u", "c", 120L))(("u", "c"))
    assert(r.getLong(2) == 2L && r.isNullAt(7))
    assert(!r.isNullAt(6)) // the dispersion itself still reads
  }

  test("all-tie gaps (sum 0) publish NULL fano and verdict") {
    val r = screen(minGaps = 2L)(("u", "c", 5L), ("u", "c", 5L),
      ("u", "c", 5L))(("u", "c"))
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(6) && r.isNullAt(7))
  }

  test("channels are independent keys") {
    val rows = (0 to 5).map(i => ("u", "dns", i * 100L)) ++
      Seq(("u", "web", 0L), ("u", "web", 7L), ("u", "web", 1000L),
        ("u", "web", 1002L), ("u", "web", 5000L), ("u", "web", 9000L))
    val got = screen(minGaps = 5L)(rows: _*)
    assert(got(("u", "dns")).getBoolean(7))
    assert(!got(("u", "web")).getBoolean(7))
  }
}
