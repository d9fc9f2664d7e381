package graft.operators

import graft.SparkSpec

/** k-core peeling: pendant removal, cascade rounds (path graph — the
  * worst case), superset honesty before convergence, dedup/self-loop
  * contracts.
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  test("a pendant vertex peels off; the triangle is the 2-core") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = KCore.peel(edges, "src", "dst", k = 2, rounds = 2)
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("a path graph cascades one layer per round and empties") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    // round 1 removes the endpoints; survivors 2,3,4 with honest
    // within-subgraph degrees (2 and 4 now under k — the superset state)
    val r1 = KCore.peel(path, "src", "dst", 2, rounds = 1)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSeq == Seq((2L, 1L), (3L, 2L), (4L, 1L)))
    // the fixpoint is empty: a path has no 2-core
    assert(KCore.peel(path, "src", "dst", 2, rounds = 3).count() == 0L)
  }

  test("duplicate and reversed input edges never inflate degrees") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L)) // self-loop drops
      .toDF("src", "dst")
    val got = KCore.peel(edges, "src", "dst", 2, rounds = 2)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("converged peel is stable: one more round changes nothing") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val a = KCore.peel(edges, "src", "dst", 2, rounds = 3)
      .orderBy("vertex").collect().toSeq
    val b = KCore.peel(edges, "src", "dst", 2, rounds = 4)
      .orderBy("vertex").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
