package graft.operators

import graft.SparkSpec

/** Growth curve: debut counting, the dense flat stretch, whale-entity
  * collapse to one debut, NULL stratum.
  */
class GrowthCurveSpec extends SparkSpec {

  import spark.implicits._

  test("debuts count once at first appearance; the spine stays dense") {
    // u1 debuts day 1 (appears again day 4), u2 day 1, u3 day 4;
    // days 2-3 nobody debuts but the curve still shows flat rows
    val df = Seq(("a", 1L, 1L), ("a", 1L, 4L), ("a", 2L, 1L),
      ("a", 3L, 4L)).toDF("g", "u", "day")
    val got = GrowthCurve.cumulativeUniques(df, Seq("g"), "u", "day")
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("new_entities"),
        r.getAs[Long]("cum_entities")))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L), (2L, 0L, 2L), (3L, 0L, 2L), (4L, 1L, 3L)))
  }

  test("groups curve independently; NULL group is a real stratum") {
    val df = Seq(
      (Some("a"), 1L, 1L), (Some("b"), 1L, 2L),
      (Option.empty[String], 9L, 5L))
      .toDF("g", "u", "day")
    val got = GrowthCurve.cumulativeUniques(df, Seq("g"), "u", "day")
      .collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("bucket"),
        r.getAs[Long]("cum_entities")))
    assert(got.toSet == Set(
      (Some("a"), 1L, 1L), (Some("b"), 2L, 1L), (None, 5L, 1L)))
  }
}
