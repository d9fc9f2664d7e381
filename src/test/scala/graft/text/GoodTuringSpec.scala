package graft.text

import graft.SparkSpec

class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  private val terms = (Seq.fill(5)("the") ++ Seq.fill(3)("cat") ++
    Seq.fill(3)("dog") ++ Seq("sat", "mat", "hat"))
    .map(("en", _)) ++ Seq(("de", "der"), ("de", "der"), ("de", "hund"))

  test("f-of-f table: hand counts per group") {
    val got = GoodTuring.freqOfFreq(terms.toDF("g", "term"), "g", "term")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // en: the x5, cat/dog x3, sat/mat/hat x1 -> {5:1, 3:2, 1:3}
    assert(got == Map(
      ("en", 5L) -> 1L, ("en", 3L) -> 2L, ("en", 1L) -> 3L,
      ("de", 2L) -> 1L, ("de", 1L) -> 1L))
  }

  test("unseen mass: p0 = N1/N exactly; saturated corpora go to zero") {
    val got = GoodTuring.unseenMass(terms.toDF("g", "term"), "g", "term")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: N=14, types=6, singletons=3 -> p0 = 3e6/14 = 214285
    assert(got("en") == ((14L, 6L, 3L, 214285L)))
    // de: N=3, singletons=1 -> 333333
    assert(got("de") == ((3L, 2L, 1L, 333333L)))
    val saturated = Seq.fill(10)(("g", "x")) ++ Seq.fill(10)(("g", "y"))
    val s = GoodTuring.unseenMass(saturated.toDF("g", "term"), "g", "term").head()
    assert(s.getLong(3) == 0L && s.getLong(4) == 0L)
  }

  test("NULL terms drop; NULL group is a stratum") {
    val df = Seq((Some("g"), Some("a")), (Some("g"), None),
      (None, Some("b"))).toDF("g", "term")
    val got = GoodTuring.unseenMass(df, "g", "term").collect()
    assert(got.length == 2 && got.exists(_.isNullAt(0)))
  }
}
