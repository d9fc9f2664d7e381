package graft.operators

import graft.SparkSpec

/** Seasonal indexes: hand mean ratios, negative-cell sign, non-positive
  * total NULL, NULL stratum.
  */
class SeasonalSpec extends SparkSpec {

  import spark.implicits._

  test("hand ratios: position means against the grand mean") {
    // group a: pos 1 -> values (10, 20), pos 2 -> (40): grand mean 70/3
    // idx(1) = 15/(70/3) = 9/14; idx(2) = 40/(70/3) = 12/7
    val df = Seq(("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 40L))
      .toDF("g", "pos", "v")
    val got = Seasonal.indexes(df, Seq("g"), "pos", "v")
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("sum_pos"), r.getAs[Long]("idx_q6")))
    assert(got.toSeq == Seq(
      (1L, 2L, 30L, 642857L),     // floor(9/14 * 1e6)
      (2L, 1L, 40L, 1714285L)))   // floor(12/7 * 1e6)
  }

  test("negative cell keeps its sign; non-positive total nulls the group") {
    val df = Seq(("a", 1L, -10L), ("a", 2L, 30L),
      ("z", 1L, -5L), ("z", 2L, 5L)).toDF("g", "pos", "v")
    val got = Seasonal.indexes(df, Seq("g"), "pos", "v")
      .orderBy("g", "pos").collect()
      .map(r => (r.getString(0), r.getAs[Long]("pos"),
        Option(r.get(r.fieldIndex("idx_q6")))))
    // a: total 20, mean 10; pos1 mean -10 -> -1.0; pos2 mean 30 -> 3.0
    // z: total 0 -> NULL for both positions
    assert(got.toSeq == Seq(
      ("a", 1L, Some(-1000000L)), ("a", 2L, Some(3000000L)),
      ("z", 1L, None), ("z", 2L, None)))
  }

  test("NULL group is a real stratum; NULL pos/value rows drop") {
    val df = Seq(
      (Option.empty[String], Some(1L), Some(10L)),
      (Option.empty[String], Some(1L), Some(30L)),
      (Some("a"), None, Some(99L)),
      (Some("a"), Some(1L), None),
      (Some("a"), Some(1L), Some(7L)))
      .toDF("g", "pos", "v")
    val got = Seasonal.indexes(df, Seq("g"), "pos", "v")
      .collect().map(r => (Option(r.getString(0)), r.getAs[Long]("idx_q6")))
    // each surviving group has one position == its own mean -> exactly 1e6
    assert(got.toSeq.sortBy(_.toString) == Seq(
      (None, 1000000L), (Some("a"), 1000000L)).sortBy(_.toString))
  }
}
