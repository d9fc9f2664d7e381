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

  test("peelToFixpoint equals bounded peel at sufficient rounds") {
    // a path welded to a triangle: the path layers peel off one per
    // round (the worst-case cascade), the triangle survives as the 2-core
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)) ++
      Seq((6L, 7L), (7L, 8L), (6L, 8L))).toDF("src", "dst")
    val fix = KCore.peelToFixpoint(edges, "src", "dst", k = 2)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bounded = KCore.peel(edges, "src", "dst", k = 2, rounds = 10)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fix.toSeq == Seq((6L, 2L), (7L, 2L), (8L, 2L)))
    assert(fix.toSeq == bounded.toSeq)
    // every survivor honors the shipped guarantee: degree >= k
    assert(fix.forall(_._2 >= 2L))
  }

  test("peelToFixpoint empties a coreless graph and throws past maxRounds") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    assert(KCore.peelToFixpoint(path, "src", "dst", k = 2).count() == 0L)
    // 6-path needs 3 shrinking sweeps to empty; a 1-round cap must refuse
    // to return the still-shrinking superset
    intercept[IllegalStateException] {
      KCore.peelToFixpoint(path, "src", "dst", k = 2, maxRounds = 1)
    }
  }
}
