package graft.operators

import graft.SparkSpec

/** JSD: identical snapshots at exactly 0, the disjoint ln2 bound, the
  * new-category finite signal (PSI's failure case), symmetry, NULL
  * exclusion, empty-side raise.
  */
class JsdSpec extends SparkSpec {

  import spark.implicits._

  private def df(vs: String*) = vs.toDF("v")

  private def contribs(ref: Seq[String], cur: Seq[String]): Map[String, Long] =
    Jsd.jsdCategorical(ref.toDF("v"), cur.toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

  test("identical distributions diverge exactly 0 per category") {
    val got = contribs(Seq("a", "a", "b"), Seq("a", "a", "b"))
    assert(got == Map("a" -> 0L, "b" -> 0L))
  }

  test("disjoint supports hit the ln 2 bound, split per category") {
    val got = contribs(Seq("a"), Seq("b"))
    // each side contributes (1/2)ln2 = 346573 micro-nats floored
    assert(got("a") == 346573L && got("b") == 346573L)
    assert(got.values.sum == 693146L) // ~ln2 * 1e6 with per-term floors
  }

  test("a new category is a finite signal (PSI would be undefined)") {
    val got = contribs(Seq("a", "a", "a", "a"), Seq("a", "a", "a", "b"))
    assert(got("b") > 0L && got("b") < 693147L)
    assert(got("a") > 0L) // mass shifted off 'a' too
  }

  test("JSD is symmetric in its arguments") {
    val ab = contribs(Seq("a", "a", "b"), Seq("a", "b", "b"))
    val ba = contribs(Seq("a", "b", "b"), Seq("a", "a", "b"))
    assert(ab == ba)
  }

  test("NULL categories are excluded; an empty side raises") {
    val withNull = Seq(Some("a"), None).toDF("v")
    val got = Jsd.jsdCategorical(withNull, Seq("a").toDF("v"), "v").collect()
    assert(got.length == 1 && got.head.getLong(3) == 0L)
    val e = intercept[Exception] {
      Jsd.jsdCategorical(Seq.empty[String].toDF("v"),
        Seq("a").toDF("v"), "v").collect()
    }
    assert(e.getMessage.contains("empty snapshot"))
  }
}
