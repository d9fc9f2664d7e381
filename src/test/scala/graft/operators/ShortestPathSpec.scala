package graft.operators

import graft.SparkSpec

/** Weighted shortest paths: hand-checked relaxation rounds, the
  * bounded-hop semantics (cheaper-but-longer routes appear only once
  * the bound admits them), parallel-edge min collapse, fixpoint ≡
  * sufficient bound, and the weight contracts.
  */
class ShortestPathSpec extends SparkSpec {

  import spark.implicits._

  // 1—2 (1), 2—3 (1), 1—3 (5), 3—4 (2): the 1→2→3 detour beats the
  // direct 1—3 edge but needs two hops
  private def diamond =
    Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
      .toDF("src", "dst", "w")

  private def run(maxHops: Int) =
    ShortestPath.distances(diamond, "src", "dst", "w",
        Seq(1L).toDF("seed"), "seed", maxHops)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))

  test("bounded hops: the cheap detour appears only when the bound admits it") {
    assert(run(1).toSeq == Seq((1L, 0L), (2L, 1L), (3L, 5L)))
    assert(run(2).toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 7L)))
    assert(run(3).toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 4L)))
  }

  test("fixpoint equals the bounded form at a sufficient bound") {
    val fix = ShortestPath.toFixpoint(diamond, "src", "dst", "w",
        Seq(1L).toDF("seed"), "seed")
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fix.toSeq == run(3).toSeq)
  }

  test("parallel edges collapse to min; self-loops and NULL weights drop") {
    val edges = Seq(
      (1L, 2L, Some(9L)), (2L, 1L, Some(3L)),   // parallel (symmetrized) pair
      (1L, 1L, Some(1L)),                       // self-loop
      (2L, 3L, None)                            // unpriceable edge
    ).toDF("src", "dst", "w")
    val got = ShortestPath.distances(edges, "src", "dst", "w",
        Seq(1L).toDF("seed"), "seed", maxHops = 2)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 3L)))
  }

  test("multi-source takes the cheapest seed; isolated seed stays at 0") {
    val path = Seq((1L, 2L, 10L), (2L, 3L, 10L)).toDF("src", "dst", "w")
    val got = ShortestPath.distances(path, "src", "dst", "w",
        Seq(Some(1L), Some(3L), Some(99L), Option.empty[Long]).toDF("seed"),
        "seed", maxHops = 1)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq ==
      Seq((1L, 0L), (2L, 10L), (3L, 0L), (99L, 0L)))
  }

  test("negative weight fails the plan loudly") {
    val bad = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      ShortestPath.distances(bad, "src", "dst", "w",
        Seq(1L).toDF("seed"), "seed", maxHops = 1).collect()
    }
    assert(ex.getMessage.contains("negative edge weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative edge weight")))
  }

  test("non-convergence past maxRounds throws, convergence returns early") {
    val path = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    intercept[IllegalStateException] {
      ShortestPath.toFixpoint(path, "src", "dst", "w", seeds, "seed",
        maxRounds = 2)
    }
    val ok = ShortestPath.toFixpoint(path, "src", "dst", "w", seeds, "seed",
        maxRounds = 10)
      .orderBy("vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }
}
