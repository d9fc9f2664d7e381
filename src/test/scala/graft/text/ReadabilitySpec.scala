package graft.text

import graft.SparkSpec

/** Flesch readability: hand-checked counts and centi-score, sentence
  * floor, digit/punct word boundaries, NULL/empty contracts.
  */
class ReadabilitySpec extends SparkSpec {

  import spark.implicits._

  private def one(text: String): (Long, Long, Long, Option[Long]) = {
    val r = Readability.flesch(
      Seq((1L, text)).toDF("id", "text"), "id", "text").head()
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("hand case: 6 words, 2 sentences, 6 syllables → 119.20") {
    // Flesch = 206.835 − 1.015·(6/2) − 84.6·(6/6) = 119.19 → centi
    // floor-by-term: 20684 − 304 − 8460 = 11920
    assert(one("The cat sat. It ran fast!") == ((6L, 2L, 6L, Some(11920L))))
  }

  test("vowel RUNS count once (diphthongs), y is a vowel") {
    // "beautiful sky" → beau-ti-ful: runs eau,i,u = 3; sky: y = 1
    val (w, s, syl, _) = one("beautiful sky")
    assert((w, s, syl) == ((2L, 1L, 4L)))
  }

  test("no terminator floors sentences at one; digits break words") {
    val (w, s, syl, score) = one("room 42 is big")
    // words: room, is, big (42 is not a [a-z]+ run)
    assert((w, s) == ((3L, 1L)))
    assert(syl == 3L)
    assert(score.contains(20684L - (203 * 3) / 2 - (8460 * 3) / 3))
  }

  test("ellipses and stacked terminators are one sentence break") {
    val (_, s, _, _) = one("wait... what?! ok")
    assert(s == 2L)
  }

  test("NULL and wordless text score NULL with zero counts") {
    assert(one("12345 !!!") == ((0L, 1L, 0L, None)))
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    val r = Readability.flesch(df, "id", "text").head()
    assert((r.getLong(1), r.getLong(3), r.isNullAt(4)) == ((0L, 0L, true)))
  }
}
