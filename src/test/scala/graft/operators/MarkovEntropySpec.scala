package graft.operators

import graft.SparkSpec

/** Markov entropy: hand ln-2 case, deterministic-chain zero,
  * per-term floor discipline, rate weighting.
  */
class MarkovEntropySpec extends SparkSpec {

  import spark.implicits._

  test("uniform two-way branching scores ln 2 per state; deterministic scores 0") {
    // a -> {b, c} equally (4+4); b -> b always (2)
    val trans = Seq(("a", "b", 4L), ("a", "c", 4L), ("b", "b", 2L))
      .toDF("from_type", "to_type", "n")
    val got = MarkovEntropy.fromTransitions(trans)
      .orderBy("from_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_out"),
        r.getAs[Long]("n_next"), r.getAs[Long]("h_q6"),
        r.getAs[Long]("rate_q6")))
    val ln2 = math.log(2.0)
    // h(a) = 2·⌊10⁶·(1/2)·ln2⌋ = 2·346573 = 693146 ≈ ln2·10⁶
    assert(got(0) == (("a", 8L, 2L, 693146L,
      // rate terms: 2·⌊10⁶·(4/10)·ln2⌋ = 2·277258
      554516L)))
    assert(got(1) == (("b", 2L, 1L, 0L, 0L)))
    assert(math.abs(got(0)._4 - 1000000L * ln2) <= 2)
  }

  test("per-term floors: a 2:1 split matches hand arithmetic exactly") {
    val trans = Seq(("s", "x", 2L), ("s", "y", 1L)).toDF("from_type", "to_type", "n")
    val r = MarkovEntropy.fromTransitions(trans).collect().head
    val t1 = math.floor(1e6 * (2.0 / 3.0) * math.log(3.0 / 2.0)).toLong
    val t2 = math.floor(1e6 * (1.0 / 3.0) * math.log(3.0)).toLong
    assert(r.getAs[Long]("h_q6") == t1 + t2)
    // single chain: rate == h (this state holds all transition mass)
    assert(r.getAs[Long]("rate_q6") == t1 + t2)
  }

  test("rate weights states by their transition mass") {
    // state a: 90 transitions uniform over 2; state b: 10 uniform over 2
    val trans = Seq(("a", "x", 45L), ("a", "y", 45L),
      ("b", "x", 5L), ("b", "y", 5L)).toDF("from_type", "to_type", "n")
    val m = MarkovEntropy.fromTransitions(trans).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("rate_q6")).toMap
    // both states have h = ln2, but a carries 9x the rate mass
    assert(m("a") > 8 * m("b") && m("a") < 10 * m("b"))
  }
}
