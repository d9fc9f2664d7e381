package graft.operators

import graft.SparkSpec

/** Fano: constant series underdisperses, a Poisson-exact hand case,
  * bursty counts overdisperse, boundary exactness, negative raise,
  * degenerate NULLs.
  */
class DispersionSpec extends SparkSpec {

  import spark.implicits._

  private def series(vs: Long*) = vs.map(("g", _)).toDF("grp", "x")

  test("hand moments: counts 1,2,3 give D = 1/2 exactly") {
    // n=3, s=6, ss=14: var_num = 42-36 = 6, den = 2*6 = 12
    val r = Dispersion.fano(series(1L, 2L, 3L), "grp", "x").head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getString(3) == "6" && r.getString(4) == "12")
    assert(r.getLong(5) == 500000L)
    assert(!r.getBoolean(6))
  }

  test("a constant series has zero variance: D = 0, never overdispersed") {
    val r = Dispersion.fano(series(4L, 4L, 4L, 4L), "grp", "x").head()
    assert(r.getString(3) == "0" && r.getLong(5) == 0L && !r.getBoolean(6))
  }

  test("bursty counts overdisperse; the verdict is cross-multiplied exact") {
    val r = Dispersion.fano(series(0L, 0L, 0L, 12L), "grp", "x").head()
    // n=4, s=12, ss=144: var_num = 576-144 = 432, den = 36 -> D = 12
    assert(r.getString(3) == "432" && r.getString(4) == "36")
    assert(r.getLong(5) == 12000000L && r.getBoolean(6))
  }

  test("exact boundary: var_num == den is NOT overdispersed") {
    // n=2, values 0,2: var_num = 2*4-4 = 4... find D = 1: values 1,3:
    // n=2, s=4, ss=10: var_num = 20-16 = 4, den = 1*4 = 4 -> D = 1
    val r = Dispersion.fano(series(1L, 3L), "grp", "x").head()
    assert(r.getString(3) == r.getString(4))
    assert(r.getLong(5) == 1000000L && !r.getBoolean(6))
  }

  test("negative counts raise; degenerate groups publish NULLs") {
    val e = intercept[Exception] {
      Dispersion.fano(series(1L, -2L), "grp", "x").collect()
    }
    assert(e.getMessage.contains("negative count"))
    val single = Dispersion.fano(series(5L), "grp", "x").head()
    assert(single.isNullAt(5) && single.isNullAt(6))
    val zeros = Dispersion.fano(series(0L, 0L), "grp", "x").head()
    assert(zeros.isNullAt(5) && zeros.isNullAt(6))
  }
}
