package graft.operators

import graft.SparkSpec

/** Seasonal-naive backtest: hand-checked MASE, zero-filled outage days
  * count as mispredictions, constant-series NULL contract.
  */
class BacktestSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("hand case: linear ramp, season 3") {
    val rows = (1 to 8).map(i => (1L, d(f"2024-01-$i%02d"), i * 10L))
    val got = Backtest.seasonalNaive(rows.toDF("g", "dt", "v"),
      "g", "dt", "v", season = 3).head()
    // eval days 4..8: es = 30 each (5×30 = 150), e1 = 10 each (50)
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) == ((5L, 150L, 50L, 30L, 30000L)))
  }

  test("a gap day zero-fills and counts as a (badly) predicted day") {
    val rows = Seq((1L, d("2024-01-01"), 10L), (1L, d("2024-01-02"), 20L),
      (1L, d("2024-01-03"), 30L), (1L, d("2024-01-05"), 50L))
    val got = Backtest.seasonalNaive(rows.toDF("g", "dt", "v"),
      "g", "dt", "v", season = 2).head()
    // spine 01..05 = 10,20,30,0,50; eval d3..d5:
    // es = 20,20,20 (60); e1 = 10,30,50 (90); mase = 600000 div 90
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) == ((3L, 60L, 90L, 20L, 6666L)))
  }

  test("constant series: zero naive error admits no scaling (NULL mase)") {
    val rows = (1 to 4).map(i => (1L, d(f"2024-01-0$i"), 10L))
    val got = Backtest.seasonalNaive(rows.toDF("g", "dt", "v"),
      "g", "dt", "v", season = 2).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(4)) == ((2L, 0L, 0L)))
    assert(got.isNullAt(5))
  }

  test("groups shorter than the warm-up vanish; season < 2 refuses") {
    val rows = Seq((1L, d("2024-01-01"), 10L), (1L, d("2024-01-02"), 20L))
    assert(Backtest.seasonalNaive(rows.toDF("g", "dt", "v"),
      "g", "dt", "v", season = 7).count() == 0L)
    intercept[IllegalArgumentException] {
      Backtest.seasonalNaive(rows.toDF("g", "dt", "v"), "g", "dt", "v", 1)
    }
  }
}
