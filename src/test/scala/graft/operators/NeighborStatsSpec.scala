package graft.operators

import graft.SparkSpec

/** Neighbor-degree features: hand star+triangle case, exact micro
  * truncation, symmetrization.
  */
class NeighborStatsSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: hub vs leaf neighbor profiles") {
    // star hub 1 -> 2,3,4 plus edge 2-3 (triangle corner degrees 2,2)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("src", "dst")
    // degrees: 1->3, 2->2, 3->2, 4->1
    val got = NeighborStats.degreeStats(edges, "src", "dst")
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 2L, 1666666L),  // nbrs 2,2,1 -> avg 5/3
      (2L, 2L, 2L, 3L, 2500000L),  // nbrs 3,2  -> avg 5/2
      (3L, 2L, 2L, 3L, 2500000L),
      (4L, 1L, 3L, 3L, 3000000L)))
  }

  test("duplicates, reversal, and self-loops never inflate degrees") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L))
      .toDF("src", "dst")
    val got = NeighborStats.degreeStats(edges, "src", "dst")
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 1L, 1000000L), (2L, 1L, 1000000L)))
  }
}
