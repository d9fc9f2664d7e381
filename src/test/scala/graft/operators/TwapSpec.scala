package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TWAP: hand weighted averages, horizon semantics, busy-period
  * robustness vs the plain mean, guard raises, NULL contracts.
  */
class TwapSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: levels weighted by how long they held") {
    // level 10 holds [0, 4), 40 holds [4, 10): twap = (40 + 240)/10 = 28
    val df = Seq(("g", 0L, 10L), ("g", 4L, 40L)).toDF("grp", "t", "v")
    val r = Twap.twap(df, "grp", "t", "v", endIdx = 10L).collect().head
    assert(r.getAs[Long]("t_start") == 0L)
    assert(r.getAs[String]("wsum") == "280")
    assert(r.getAs[Long]("span") == 10L)
    assert(r.getAs[Long]("twap_q6") == 28000000L)
  }

  test("busy periods don't over-vote: many samples of one level") {
    // level 100 sampled 9 times in [0, 9), level 0 holds [9, 18):
    // twap = 50 exactly — the plain mean of samples would say 90
    val df = ((0L until 9L).map(t => ("g", t, 100L)) :+ (("g", 9L, 0L)))
      .toDF("grp", "t", "v")
    val r = Twap.twap(df, "grp", "t", "v", endIdx = 18L).collect().head
    assert(r.getAs[Long]("twap_q6") == 50000000L)
  }

  test("negative levels sign-split; truncation toward zero") {
    val df = Seq(("g", 0L, -10L), ("g", 1L, 3L)).toDF("grp", "t", "v")
    // wsum = -10 + 3*2 = -4 over span 3 -> -4/3 -> -1333333
    val r = Twap.twap(df, "grp", "t", "v", endIdx = 3L).collect().head
    assert(r.getAs[String]("wsum") == "-4")
    assert(r.getAs[Long]("twap_q6") == -1333333L)
  }

  test("index past the horizon raises; duplicate idx raises — even on twap-only projection") {
    val over = Seq(("g", 0L, 1L), ("g", 9L, 1L)).toDF("grp", "t", "v")
    val e = intercept[Exception] {
      Twap.twap(over, "grp", "t", "v", endIdx = 5L).select("twap_q6").collect()
    }
    assert(e.getMessage.contains("exceeds endIdx"))
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L)).toDF("grp", "t", "v")
    val e2 = intercept[Exception] {
      Twap.twap(dup, "grp", "t", "v", endIdx = 5L).select("twap_q6").collect()
    }
    assert(e2.getMessage.contains("duplicate idx"))
  }

  test("NULL rows drop; NULL group is a stratum; degenerate zero span is NULL") {
    val df = Seq((Some("a"), Some(0L), Some(5L)), (Some("a"), None, Some(9L)),
      (Option.empty[String], Some(0L), Some(7L)), (Some("z"), Some(4L), Some(3L)))
      .toDF("grp", "t", "v")
    val got = Twap.twap(df, "grp", "t", "v", endIdx = 4L).collect()
      .map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(r.fieldIndex("twap_q6"))) None
         else Some(r.getAs[Long]("twap_q6")))).toMap
    assert(got(Some("a")) == Some(5000000L))
    assert(got(None) == Some(7000000L))
    assert(got(Some("z")).isEmpty, "t_start == endIdx must be NULL, not a division")
  }
}
