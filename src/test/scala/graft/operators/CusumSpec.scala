package graft.operators

import graft.SparkSpec

/** CUSUM: hand two-sided chains vs the textbook recurrence, flat-series
  * zeros, NULL contracts.
  */
class CusumSpec extends SparkSpec {

  import spark.implicits._

  test("hand chain: prefix-min form equals the max(0,...) recurrence") {
    // k=10: d = (2,3,-2,-1,5); S+ = 2,5,3,2,7; S- = 0,0,2,3,0
    val df = Seq(("g", 1L, 12L), ("g", 2L, 13L), ("g", 3L, 8L),
      ("g", 4L, 9L), ("g", 5L, 15L)).toDF("grp", "i", "x")
    val got = Cusum.twoSided(df, "grp", "i", "x", k = 10, h = 5)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"),
        r.getAs[Boolean]("alarm_up"), r.getAs[Boolean]("alarm_dn")))
    assert(got.toSeq == Seq(
      (2L, 0L, false, false), (5L, 0L, true, false), (3L, 2L, false, false),
      (2L, 3L, false, false), (7L, 0L, true, false)))
  }

  test("downward drift alarms the negative side") {
    val df = Seq(("g", 1L, 7L), ("g", 2L, 6L), ("g", 3L, 7L))
      .toDF("grp", "i", "x")
    val got = Cusum.twoSided(df, "grp", "i", "x", k = 10, h = 8)
      .orderBy("idx").collect()
      .map(r => (r.getAs[Long]("s_neg"), r.getAs[Boolean]("alarm_dn")))
    // e = 3,4,3 -> S- = 3,7,10
    assert(got.toSeq == Seq((3L, false), (7L, false), (10L, true)))
  }

  test("on-target series stays at zero both sides") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L)).toDF("grp", "i", "x")
    val got = Cusum.twoSided(df, "grp", "i", "x", k = 10, h = 1)
      .collect().map(r => (r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg")))
    assert(got.forall(_ == (0L, 0L)))
  }

  test("NULL idx/value rows drop; NULL group is a real stratum") {
    val df = Seq(
      (Some("a"), Some(1L), Some(15L)), (Some("a"), Some(2L), None),
      (Option.empty[String], Some(1L), Some(20L)))
      .toDF("grp", "i", "x")
    val got = Cusum.twoSided(df, "grp", "i", "x", k = 10, h = 5).collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("s_pos")))
    assert(got.toSet == Set((Some("a"), 5L), (None, 10L)))
  }
}
