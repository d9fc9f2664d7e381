package graft.llm

import graft.SparkSpec

/** Shapley: the unanimity closed form on hand coalitions, the
  * efficiency axiom (Σφ = conversions), direct-bucket honesty,
  * post-conversion touch exclusion, the coalition-size raise, lcm.
  */
class ShapleyAttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.map { case (u, c, t) =>
      (u, c, new java.sql.Timestamp(t * 1000L)) }.toDF("u", "c", "ts")

  test("equal split per coalition is the exact Shapley value") {
    // u1 touches {a,b} then converts; u2 touches {a} then converts
    val df = ev((1L, "a", 10L), (1L, "b", 20L), (1L, "buy", 30L),
      (2L, "a", 10L), (2L, "buy", 20L))
    val got = ShapleyAttribution.shapley(df, "u", "c", "ts", "buy")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val L = got.values.head._1 * 0 + 27720L // lcm(1..12)
    assert(got("a") == ((2L, L / 2 + L)))   // half of u1 + all of u2
    assert(got("b") == ((1L, L / 2)))
    assert(got.values.map(_._2).sum == 2 * L) // efficiency: 2 converters
  }

  test("touches after the first conversion earn nothing") {
    val df = ev((1L, "a", 10L), (1L, "buy", 20L), (1L, "b", 30L),
      (1L, "buy", 40L))
    val got = ShapleyAttribution.shapley(df, "u", "c", "ts", "buy")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.contains("a") && !got.contains("b"))
  }

  test("touchless converters fill the declared direct bucket") {
    val df = ev((1L, "buy", 10L), (2L, "a", 5L), (2L, "buy", 10L))
    val got = ShapleyAttribution.shapley(df, "u", "c", "ts", "buy")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("(direct)") == 27720L && got("a") == 27720L)
    assert(got.values.sum == 2 * 27720L) // efficiency still holds
  }

  test("non-converters contribute nothing") {
    val df = ev((1L, "a", 10L), (1L, "buy", 20L), (2L, "a", 10L),
      (2L, "b", 20L))
    val got = ShapleyAttribution.shapley(df, "u", "c", "ts", "buy")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((1L, 27720L))))
  }

  test("oversized coalitions raise in-plan; lcm is exact") {
    assert(ShapleyAttribution.lcmUpTo(12) == 27720L)
    assert(ShapleyAttribution.lcmUpTo(1) == 1L)
    val touches = (1 to 3).map(i => (1L, s"c$i", i.toLong * 10)) :+
      ((1L, "buy", 100L))
    val e = intercept[Exception] {
      ShapleyAttribution.shapley(ev(touches: _*), "u", "c", "ts", "buy",
        maxCoalition = 2).collect()
    }
    assert(e.getMessage.contains("exceeds maxCoalition"))
  }
}
