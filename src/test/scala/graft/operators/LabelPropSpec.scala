package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic LPA: two-clique hand case, tie-break rule, undirected
  * symmetrization, duplicate-edge weighting, partitioning independence.
  */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  test("two cliques joined by one bridge settle on per-clique min labels") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val got = LabelProp.communities(es.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both cliques flood their minimum label; the bridge endpoints stay
    // with their denser side
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(10L) == got(11L) && got(11L) == got(12L))
    assert(got(1L) != got(10L), s"cliques merged: $got")
  }

  test("one round by hand: most-frequent neighbor label, min-label ties") {
    // star: center 5 with leaves 1,2,3 — after round 1 the center adopts
    // min leaf label (all counts 1), each leaf adopts 5
    val es = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    val got = LabelProp.communities(es.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1L)
    assert(got(1L) == 5L && got(2L) == 5L && got(3L) == 5L)
  }

  test("duplicate edges count double in the vote") {
    // node 9's neighbors: label 1 twice (dup edge), label 2 once
    val es = Seq((9L, 1L), (9L, 1L), (9L, 2L))
    val got = LabelProp.communities(es.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(9L) == 1L)
  }

  test("partitioning independence; NULL endpoints drop") {
    val es = Seq((Some(1L), Some(2L)), (Some(2L), Some(3L)),
      (None, Some(4L)), (Some(4L), None)).toDF("src", "dst")
    val a = LabelProp.communities(es, iters = 3)
      .collect().map(_.toSeq).toSet
    val b = LabelProp.communities(es.repartition(7), iters = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    assert(!a.exists(_.head == 4L), "node with only NULL-peer edges must not appear")
  }
}
