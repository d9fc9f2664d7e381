package graft.operators

import graft.SparkSpec

/** Grid-blocked radius join: exact distance edge, cross-cell pairs,
  * negative coordinates, no duplicate candidates, id/NULL contracts.
  */
class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: boundary inclusive, just-outside excluded, cross-cell found") {
    val df = Seq(
      (1L, 0L, 0L),
      (2L, 3L, 4L),    // dist 5 from id 1 — exactly r
      (3L, 10L, 0L),   // dist 10 from id 1 — out; dist ~8.06 from id 2 — out
      (4L, 9L, 1L),    // cell (1,0) at r=5; dist² to id 3 = 1+1=2 — in, cross-cell
      (5L, 0L, 9L)     // dist 9 from id 1, √34 from id 2 — both out at r=5
    ).toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(df, "id", "x", "y", 5L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 25L), (3L, 4L, 2L)))
  }

  test("each pair reported exactly once even when both points share a cell") {
    val df = Seq((1L, 100L, 100L), (2L, 101L, 101L), (3L, 102L, 100L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(df, "id", "x", "y", 10L).collect()
    assert(got.length == 3) // all three pairs, no duplicates
    assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 3)
  }

  test("negative coordinates block correctly (floor cells, not truncation)") {
    val df = Seq((1L, -1L, -1L), (2L, 1L, 1L), (3L, -12L, -12L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(df, "id", "x", "y", 5L)
      .orderBy("id_a").collect()
    // (-1,-1) and (1,1): dist² = 8 ≤ 25 — the pair straddles the origin
    // cell boundary, which truncation-cells would miss
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) ==
      ((1L, 2L, 8L)))
  }

  test("grid blocking is lossless vs brute force on a random cloud") {
    val pts = (1L to 200L).map { i =>
      (i, (i * 48271) % 503 - 251, (i * 16807) % 503 - 251)
    }
    val df = pts.toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(df, "id", "x", "y", 40L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= 1600L
    } yield (a, b, d2)).sortBy(p => (p._1, p._2))
    assert(got.toSeq == want)
    assert(want.nonEmpty)
  }

  test("nearest neighbor: mutual pair, out-of-radius absence, lowest-id tie") {
    val df = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L))
      .toDF("id", "x", "y")
    val got = SpatialJoin.nearestNeighbor(df, "id", "x", "y", 5L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 3 has no neighbor within r → absent, not fabricated
    assert(got.toSeq == Seq((1L, 2L, 25L), (2L, 1L, 25L)))
    val tie = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 4L, 0L))
      .toDF("id", "x", "y")
    val t = SpatialJoin.nearestNeighbor(tie, "id", "x", "y", 5L)
      .orderBy("id").collect()
    // 2 is equidistant from 1 and 3 → lowest id wins
    assert((t(1).getLong(0), t(1).getLong(1)) == ((2L, 1L)))
  }

  test("nearest neighbor matches brute force on a random cloud") {
    val pts = (1L to 150L).map { i =>
      (i, (i * i * 7) % 401 - 200, (i * i * i) % 401 - 200)
    }
    val got = SpatialJoin.nearestNeighbor(pts.toDF("id", "x", "y"),
        "id", "x", "y", 60L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.flatMap { case (a, xa, ya) =>
      val cands = pts.collect { case (b, xb, yb) if b != a =>
        ((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb), b)
      }.filter(_._1 <= 3600L)
      if (cands.isEmpty) None
      else { val m = cands.min; Some((a, m._2, m._1)) }
    }.sortBy(_._1)
    assert(got.toSeq == want)
    assert(want.nonEmpty)
  }

  test("NULL coordinates drop; non-integral id refuses loudly") {
    val df = Seq((1L, Some(0L), Some(0L)), (2L, None, Some(1L)),
      (3L, Some(1L), None), (4L, Some(3L), Some(0L)))
      .toDF("id", "x", "y")
    val got = SpatialJoin.radiusPairs(df, "id", "x", "y", 5L).collect()
    assert(got.length == 1)
    val bad = Seq(("a", 0L, 0L), ("b", 1L, 1L)).toDF("id", "x", "y")
    val ex = intercept[IllegalArgumentException] {
      SpatialJoin.radiusPairs(bad, "id", "x", "y", 5L)
    }
    assert(ex.getMessage.contains("integral"))
  }
}
