package graft.operators

import graft.SparkSpec

/** SPRT: hand walk to both boundaries, first-crossing pin, continue
  * case, guards.
  */
class SprtSpec extends SparkSpec {

  import spark.implicits._

  // p0 = 1/4 vs p1 = 3/4, alpha = beta = 5%: w = ln 3 (q6 1098612),
  // l = -ln 3 (floor -1098613), bounds ±ln 19 (upper 2944438,
  // lower floor(-ln 19) = -2944439)
  private val c = Sprt.consts(1, 4, 3, 4, 500, 500)

  test("quantized constants: symmetric rates give the +/- ln 3 walk") {
    assert(c.winQ6 == 1098612L)
    assert(c.loseQ6 == -1098613L)
    assert(c.upperQ6 == 2944438L)
    assert(c.lowerQ6 == -2944439L)
  }

  test("three successes cross h1 at the third sample; walk stops counting there") {
    val df = (1L to 5L).map(i => ("g", i, if (i <= 3) 1L else 0L))
      .toDF("grp", "i", "x")
    val r = Sprt.bernoulli(df, "grp", "i", "x", 1, 4, 3, 4, 500, 500)
      .collect().head
    assert(r.getAs[String]("decision") == "h1")
    assert(r.getAs[Long]("n_at_decision") == 3L)
    assert(r.getAs[Long]("llr_q6") == 3 * c.winQ6)
    assert(r.getAs[Long]("n") == 5L) // full stream still counted
  }

  test("three failures cross h0; alternating stream continues with its final llr") {
    val df = (Seq(("lo", 1L, 0L), ("lo", 2L, 0L), ("lo", 3L, 0L)) ++
      (1L to 6L).map(i => ("alt", i, i % 2)))
      .toDF("grp", "i", "x")
    val m = Sprt.bernoulli(df, "grp", "i", "x", 1, 4, 3, 4, 500, 500)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[String]("decision"), r.getAs[Long]("n_at_decision"),
          r.getAs[Long]("llr_q6")))).toMap
    assert(m("lo") == (("h0", 3L, 3 * c.loseQ6)))
    assert(m("alt") == (("continue", 6L, 3 * (c.winQ6 + c.loseQ6))))
  }

  test("first crossing wins even if the walk later re-crosses the other way") {
    // 3 wins (cross h1 at 3), then 7 losses (would cross h0 later)
    val df = ((1L to 3L).map(i => ("g", i, 1L)) ++
      (4L to 10L).map(i => ("g", i, 0L))).toDF("grp", "i", "x")
    val r = Sprt.bernoulli(df, "grp", "i", "x", 1, 4, 3, 4, 500, 500)
      .collect().head
    assert(r.getAs[String]("decision") == "h1")
    assert(r.getAs[Long]("n_at_decision") == 3L)
  }

  test("guards: non-binary outcome raises; duplicate idx raises; bad params rejected") {
    val bad = Seq(("g", 1L, 2L)).toDF("grp", "i", "x")
    val e = intercept[Exception] {
      Sprt.bernoulli(bad, "grp", "i", "x", 1, 4, 3, 4, 500, 500).collect()
    }
    assert(e.getMessage.contains("outcome must be 0/1"))
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 0L)).toDF("grp", "i", "x")
    val e2 = intercept[Exception] {
      Sprt.bernoulli(dup, "grp", "i", "x", 1, 4, 3, 4, 500, 500)
        .select("decision").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
    intercept[IllegalArgumentException] { Sprt.consts(1, 4, 1, 4, 500, 500) }
    intercept[IllegalArgumentException] { Sprt.consts(0, 4, 3, 4, 500, 500) }
    intercept[IllegalArgumentException] { Sprt.consts(1, 4, 3, 4, 0, 500) }
  }
}
