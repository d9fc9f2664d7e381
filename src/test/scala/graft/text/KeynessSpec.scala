package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keyness: a slice-exclusive term dominates, balanced terms score ~0,
  * the enrichment sign, zero-cell law, minCount pruning.
  */
class KeynessSpec extends SparkSpec {

  import spark.implicits._

  private def run(minCount: Long = 1L)(rows: (String, Boolean)*) =
    Keyness.keyness(rows.toDF("txt", "s"), "txt", col("s"), minCount)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("a slice-exclusive term scores high and enriched") {
    val got = run()(
      ("spam spam spam common", true), ("spam common", true),
      ("common common ham", false), ("ham common", false))
    assert(got("spam")._4 && got("spam")._3 > got("common")._3)
    assert(!got("ham")._4)
    assert(got("spam")._1 == 4L && got("spam")._2 == 0L)
  }

  test("a perfectly balanced term scores ~0") {
    val got = run()(("x y", true), ("x z", false))
    // x: a=1,b=1, slice share == global share -> every O == E
    assert(math.abs(got("x")._3) <= 1L)
    assert(!got("x")._4) // not strictly above
  }

  test("zero cells contribute exactly zero (the x ln x law)") {
    // one doc per side, disjoint vocab: no NaNs, finite scores
    val got = run()(("only", true), ("other", false))
    assert(got.contains("only") && got("only")._3 > 0L)
  }

  test("minCount prunes the long tail after exact arithmetic") {
    val got = run(minCount = 3L)(
      ("a a a rare", true), ("a b", false), ("b b", false))
    assert(got.contains("a") && got.contains("b") && !got.contains("rare"))
  }
}
