package graft.operators

import graft.SparkSpec

/** BFS layers: path-graph distances, multi-source minimum, isolated
  * seeds, the bounded-horizon contract, and edge symmetrization.
  */
class BfsHopsSpec extends SparkSpec {

  import spark.implicits._

  test("path graph: hop counts are exact and the horizon cuts off") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    val got = BfsHops.distances(path, "src", "dst", seeds, "seed", maxHops = 2)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("multi-source: each vertex takes the NEAREST seed's distance") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("seed")
    val got = BfsHops.distances(path, "src", "dst", seeds, "seed", maxHops = 3)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L)))
  }

  test("isolated and NULL seeds: present at 0 / dropped; edges symmetrize") {
    val edges = Seq((10L, 20L), (20L, 10L), (10L, 20L)).toDF("src", "dst")
    val seeds = Seq(Some(20L), Some(99L), None).toDF("seed")
    val got = BfsHops.distances(edges, "src", "dst", seeds, "seed", maxHops = 1)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 20 seeds the walk (reversed edge still reaches 10); 99 is isolated
    // but in-radius at 0; the NULL seed contributes nothing
    assert(got.toSeq == Seq((10L, 1L), (20L, 0L), (99L, 0L)))
  }
}
