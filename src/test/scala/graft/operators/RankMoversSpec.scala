package graft.operators

import graft.SparkSpec

/** Rank movers: deterministic tie order, debut/dropout NULLs, delta
  * signs.
  */
class RankMoversSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: climbs, falls, debuts, dropouts") {
    val df = Seq(
      ("x", "p1", 100L), ("y", "p1", 50L), ("z", "p1", 30L),
      ("y", "p2", 90L), ("x", "p2", 40L), ("w", "p2", 10L))
      .toDF("e", "p", "v")
    val got = RankMovers.movers(df, "e", "p", "v", "p1", "p2")
      .orderBy("entity").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq == Seq(
      ("w", None, Some(3L), None),            // debut
      ("x", Some(1L), Some(2L), Some(-1L)),   // fell
      ("y", Some(2L), Some(1L), Some(1L)),    // climbed
      ("z", Some(3L), None, None)))           // dropped out
  }

  test("value ties break by entity — ranks stay unique and stable") {
    val df = Seq(("b", "p1", 5L), ("a", "p1", 5L), ("a", "p2", 1L),
      ("b", "p2", 2L)).toDF("e", "p", "v")
    val got = RankMovers.movers(df, "e", "p", "v", "p1", "p2")
      .orderBy("entity").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L)))
  }
}
