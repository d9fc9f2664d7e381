package graft.operators

import graft.SparkSpec

/** Lag-k autocorrelation: hand moments on a linear series, perfect
  * anti-correlation, gap honesty, NULL-group stratum.
  */
class AutocorrSpec extends SparkSpec {

  import spark.implicits._

  test("linear series at lag 1: hand-checked exact moments, corr = 1") {
    val df = (1L to 6L).map(t => ("g", t, t)).toDF("grp", "t", "v")
    val r = Autocorr.lagCorrelation(df, "grp", "t", "v", lag = 1).head()
    // pairs x=(1..5), y=(2..6): n=5, corr_num=5*70-15*20=50, vars 50
    assert(r.getLong(1) == 5L)
    assert(r.getDecimal(2).longValueExact == 50L)
    assert(r.getDecimal(3).longValueExact == 50L)
    assert(r.getDecimal(4).longValueExact == 50L)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
  }

  test("alternating series at lag 1 anti-correlates exactly") {
    val df = (1L to 6L).map(t => ("g", t, if (t % 2 == 0) 1L else -1L))
      .toDF("grp", "t", "v")
    val r = Autocorr.lagCorrelation(df, "grp", "t", "v", lag = 1).head()
    assert(math.abs(r.getDouble(5) + 1.0) < 1e-12)
  }

  test("index gaps contribute no pair; degenerate variance yields NULL corr") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 4L, 9L))
      .toDF("grp", "t", "v")
    val r = Autocorr.lagCorrelation(df, "grp", "t", "v", lag = 1).head()
    assert(r.getLong(1) == 1L) // only the 1->2 pair; t=4 has no t=3 partner
    assert(r.isNullAt(5))      // one pair: zero variance
  }

  test("a NULL group is a real stratum") {
    val df = Seq((Some("g"), 1L, 1L), (Some("g"), 2L, 2L),
      (None, 1L, 3L), (None, 2L, 5L))
      .toDF("grp", "t", "v")
    val got = Autocorr.lagCorrelation(df, "grp", "t", "v", lag = 1)
      .collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
