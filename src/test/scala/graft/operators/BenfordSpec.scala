package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benford audit: first-digit extraction, fixed milli table, zero-filled
  * digit spine, deviation arithmetic, contracts.
  */
class BenfordSpec extends SparkSpec {

  import spark.implicits._

  test("first digits extract from magnitude; missing digits appear with 0") {
    val df = Seq(("g", 123L), ("g", 19L), ("g", -250L), ("g", 9L))
      .toDF("grp", "v")
    val got = Benford.firstDigitAudit(df, "grp", "v")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(got.keySet == (1L to 9L).toSet, "all nine digits present")
    assert(got(1L)._1 == 2L) // 123 and 19
    assert(got(2L)._1 == 1L) // |-250|
    assert(got(9L)._1 == 1L)
    assert(got(5L)._1 == 0L) // zero-filled
    // dev for digit 1: |1000·2 − 4·301| = 796
    assert(got(1L)._3 == 796L)
    // dev for an absent digit: |0 − 4·expected|
    assert(got(5L)._3 == 4L * 79L)
  }

  test("a perfectly Benford-proportioned sample scores near-zero total dev") {
    // 1000 values whose first-digit counts EQUAL the milli table
    val vals = Benford.ExpectedMilli.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n.toInt)(((i + 1) * 10 + 1).toLong) // e.g. 301× values starting with 1
    }
    val df = vals.map(("g", _)).toDF("grp", "v")
    val dev = Benford.firstDigitAudit(df, "grp", "v")
      .agg(sum("dev")).head().getLong(0)
    assert(dev == 0L, s"exact-proportion sample must have zero deviation, got $dev")
  }

  test("zeros, NULLs, and NULL groups drop") {
    val df = Seq((Some("g"), Some(10L)), (Some("g"), Some(0L)),
      (Some("g"), None), (None, Some(999L)))
      .toDF("grp", "v")
    val got = Benford.firstDigitAudit(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(got.forall(_ == (("g", 1L))), s"only the single valid row counts: ${got.toSeq}")
  }
}
