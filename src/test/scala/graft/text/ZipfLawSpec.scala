package graft.text

import graft.SparkSpec

/** Zipf slope: exact-Zipf corpus lands near −10⁴, flat corpus at 0,
  * vocab-of-1 NULL, deterministic tie rank under topN.
  */
class ZipfLawSpec extends SparkSpec {

  import spark.implicits._

  private def expectedSlope(freqs: Seq[Long]): Long = {
    val pts = freqs.sorted(Ordering[Long].reverse).zipWithIndex.map {
      case (f, i) =>
        (math.floor(1e6 * math.log(i + 1.0)).toLong,
          math.floor(1e6 * math.log(f.toDouble)).toLong)
    }
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    (num.sign * ((num.abs * 10000) / den)).toLong
  }

  test("exact-Zipf frequencies regress to about -1 (slope_q ~ -10000)") {
    // freqs 6, 3, 2 = 6/rank: ln f = ln 6 - ln r exactly (pre-floor)
    val doc = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val df = Seq(("g", doc.mkString(" "))).toDF("grp", "text")
    val r = ZipfLaw.rankFrequencySlope(df, "grp", "text").head()
    val want = expectedSlope(Seq(6L, 3L, 2L))
    assert(r.getAs[Long]("slope_q") == want)
    assert(math.abs(want + 10000L) <= 5L, s"want=$want")
    assert(r.getAs[Long]("n") == 3L)
  }

  test("flat frequencies give slope exactly 0") {
    val df = Seq(("g", "a b c a b c")).toDF("grp", "text")
    val r = ZipfLaw.rankFrequencySlope(df, "grp", "text").head()
    assert(r.getAs[Long]("slope_q") == 0L)
  }

  test("vocabulary of one reports NULL slope") {
    val df = Seq(("g", "a a a")).toDF("grp", "text")
    val r = ZipfLaw.rankFrequencySlope(df, "grp", "text").head()
    assert(r.isNullAt(r.fieldIndex("slope_q")))
  }

  test("topN keeps the head by (freq DESC, token ASC)") {
    // freqs: a=3, b=3, c=1 — topN=2 must keep a and b (tie broken by
    // token), regressing two equal freqs -> slope 0
    val df = Seq(("g", "a a a b b b c")).toDF("grp", "text")
    val r = ZipfLaw.rankFrequencySlope(df, "grp", "text", topN = 2).head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("slope_q") == 0L)
  }
}
