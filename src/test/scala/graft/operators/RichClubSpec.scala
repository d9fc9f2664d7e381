package graft.operators

import graft.SparkSpec

/** Rich club: a hub-clique-with-leaves hand case, degenerate clubs,
  * monotone edge counts, canonicalization, threshold contracts.
  */
class RichClubSpec extends SparkSpec {

  import spark.implicits._

  // a K4 core (degrees >= 3) with a pendant leaf on each core node
  private val core = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
    (2L, 4L), (3L, 4L))
  private val leaves = Seq((1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))

  private def phi(ks: Long*)(edges: (Long, Long)*) =
    RichClub.coefficients(edges.toDF("src", "dst"), "src", "dst", ks)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

  test("the hub core is a perfect rich club above the leaf degree") {
    val got = phi(0L, 1L, 3L)(core ++ leaves: _*)
    // k=0: all 8 nodes, 10 edges: phi = 20/56
    assert(got(0L) == ((8L, 10L, 2L * 10L * 1000000L / 56L)))
    // k=1: leaves (degree 1) drop: 4 nodes, 6 edges: phi = 1
    assert(got(1L) == ((4L, 6L, 1000000L)))
    // k=3: nobody exceeds degree 4... core has degree 4: > 3 keeps core
    assert(got(3L) == ((4L, 6L, 1000000L)))
  }

  test("clubs with fewer than two members publish NULL phi") {
    val got = phi(5L)(core ++ leaves: _*)
    assert(got(5L) == ((0L, 0L, -1L)))
  }

  test("edge counts are monotone non-increasing in k") {
    val got = phi(0L, 1L, 2L, 3L, 4L)(core ++ leaves: _*)
    val es = Seq(0L, 1L, 2L, 3L, 4L).map(got(_)._2)
    assert(es == es.sorted.reverse)
  }

  test("direction, duplicates, and self-loops canonicalize away") {
    val messy = Seq((2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 2L))
    val got = phi(0L)(messy: _*)
    assert(got(0L)._1 == 3L && got(0L)._2 == 2L)
  }

  test("threshold contracts: sorted, distinct, non-negative") {
    intercept[IllegalArgumentException] {
      RichClub.coefficients(Seq((1L, 2L)).toDF("src", "dst"),
        "src", "dst", Seq(2L, 1L))
    }
    intercept[IllegalArgumentException] {
      RichClub.coefficients(Seq((1L, 2L)).toDF("src", "dst"),
        "src", "dst", Seq(-1L))
    }
  }

  test("an empty canonical edge set publishes zero clubs, not NULLs (r10 fix)") {
    val got = phi(0L, 2L)((1L, 1L), (2L, 2L)) // only self-loops
    assert(got(0L) == ((0L, 0L, -1L)) && got(2L) == ((0L, 0L, -1L)))
  }
}
