package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HITS: hand round-1 values, exact BigInt reference replay, score-range
  * and zero-degree contracts, duplicate-edge semantics, partitioning
  * independence.
  */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  // 1→10, 2→10, 2→11, 3→12: node 2 is the best hub (reaches the best
  // authority 10 AND 11), 10 the best authority
  private def edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L))
    .toDF("src", "dst")

  /** Exact reference replay with BigInt sums and truncating division. */
  private def reference(es: Seq[(Long, Long)], iters: Int)
  : Map[Long, (Long, Long)] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var h = nodes.map(_ -> BigInt(1000000)).toMap
    var a = h
    (1 to iters).foreach { _ =>
      val araw = nodes.map(n =>
        n -> es.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val amx = araw.values.max
      a = araw.map { case (n, r) => n -> (r * 1000000 / amx) }
      val hraw = nodes.map(n =>
        n -> es.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val hmx = hraw.values.max
      h = hraw.map { case (n, r) => n -> (r * 1000000 / hmx) }
    }
    nodes.map(n => n -> (h(n).toLong, a(n).toLong)).toMap
  }

  test("one round by hand: best authority and best hub at full scale") {
    val got = Hits.hubsAuthorities(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // araw: 10→2e6, 11→1e6, 12→1e6 → a: 10=1e6, 11=12=500000
    assert(got(10L)._2 == 1000000L)
    assert(got(11L)._2 == 500000L && got(12L)._2 == 500000L)
    // hraw: 1→1e6, 2→1.5e6, 3→5e5 → h: 2=1e6, 1=666666, 3=333333
    assert(got(2L)._1 == 1000000L)
    assert(got(1L)._1 == 666666L && got(3L)._1 == 333333L)
    // pure sources have authority 0; pure sinks have hub 0
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 0L))
    assert(Seq(10L, 11L, 12L).forall(got(_)._1 == 0L))
  }

  test("matches the exact BigInt reference at 4 rounds; max is full-scale") {
    val es = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L), (3L, 10L),
      (4L, 11L), (4L, 12L), (5L, 13L))
    val got = Hits.hubsAuthorities(es.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = reference(es, 4)
    assert(got == want, s"got=$got want=$want")
    assert(got.values.map(_._1).max == 1000000L)
    assert(got.values.map(_._2).max == 1000000L)
    assert(got.values.forall { case (hq, aq) =>
      hq >= 0 && hq <= 1000000 && aq >= 0 && aq <= 1000000 })
  }

  test("duplicate edges count double; NULL endpoints drop") {
    val dup = Seq((Some(1L), Some(10L)), (Some(1L), Some(10L)),
      (Some(2L), Some(10L)), (None, Some(10L)), (Some(3L), None))
      .toDF("src", "dst")
    val got = Hits.hubsAuthorities(dup, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hraw: 1 → 2·a(10), 2 → a(10) ⇒ hub(1)=1e6, hub(2)=500000
    assert(got(1L)._1 == 1000000L && got(2L)._1 == 500000L)
    assert(!got.contains(3L), "NULL-dst edge must not admit its src")
  }

  test("partitioning independence") {
    val base = Hits.hubsAuthorities(edges, iters = 3)
      .collect().map(_.toSeq).toSet
    val re = Hits.hubsAuthorities(edges.repartition(7), iters = 3)
      .collect().map(_.toSeq).toSet
    assert(base == re)
  }
}
