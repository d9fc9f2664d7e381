package graft.operators

import graft.SparkSpec

/** k-truss: a clique survives, bridges fall, cascade peeling, the
  * triangle-free wipeout, canonicalization, contracts.
  */
class KTrussSpec extends SparkSpec {

  import spark.implicits._

  private def truss(k: Int, edges: (Long, Long)*) =
    KTruss.trussToFixpoint(edges.toDF("src", "dst"), "src", "dst", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private val k4 = Seq( // K4 on 1..4
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))

  test("a 4-clique IS a 4-truss: every edge keeps support 2") {
    val got = truss(4, k4: _*)
    assert(got.size == 6 && got.values.forall(_ == 2L))
  }

  test("a pendant triangle on the clique survives k=3 but not k=4") {
    val withTri = k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val at3 = truss(3, withTri: _*)
    assert(at3.size == 9) // everything: each edge in >= 1 triangle
    val at4 = truss(4, withTri: _*)
    assert(at4.keySet == k4.toSet) // the pendant triangle peels off
  }

  test("peeling cascades: removing one edge's support can doom others") {
    // two triangles sharing edge (1,2): (1,2,3) and (1,2,4); at k=4 the
    // shared edge has support 2 but (1,3),(2,3),(1,4),(2,4) have 1 ->
    // they peel, which drops (1,2) to support 0 in round two
    val got = truss(4, (1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(got.isEmpty)
  }

  test("a triangle-free graph empties in one round at any k") {
    val got = truss(3, (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)) // 4-cycle
    assert(got.isEmpty)
  }

  test("direction, duplicates, and self-loops canonicalize away") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 3L),
      (1L, 3L))
    val got = truss(3, messy: _*)
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.values.forall(_ == 1L))
  }

  test("k below 3 is rejected") {
    intercept[IllegalArgumentException] {
      KTruss.trussToFixpoint(Seq((1L, 2L)).toDF("src", "dst"),
        "src", "dst", k = 2)
    }
  }
}
