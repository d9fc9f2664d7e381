package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting vs brute force on known graphs, plus
  * the invariants the distributed bound rests on (once-per-triangle
  * generation, partitioning independence, whale-hub survival).
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]) =
    pairs.toDF("src", "dst")

  test("known small graphs") {
    // K3: one triangle, every vertex in it
    val k3 = Triangles.perVertex(edgesDf(Seq((1L, 2L), (2L, 3L), (1L, 3L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // K4: 4 triangles, each vertex in 3
    val k4e = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4 = Triangles.perVertex(edgesDf(k4e))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k4 === (1L to 4L).map(_ -> 3L).toMap)

    // path graph: no triangles, all zeros still reported
    val path = Triangles.perVertex(edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(path === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("dirty input: duplicates, reversed copies, self-loops all canonicalize") {
    val dirty = edgesDf(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)))
    val got = Triangles.perVertex(dirty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("each triangle generated exactly once (no post-dedup needed)") {
    // two triangles sharing an edge: (1,2,3) and (2,3,4)
    val tri = Triangles.triangles(
      edgesDf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))))
    val rows = tri.collect().map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 2)
    assert(rows.toSet === Set(Set(1L, 2L, 3L), Set(2L, 3L, 4L)))
  }

  test("matches brute force on a pseudo-random graph, any partitioning") {
    // deterministic Erdos-Renyi-ish graph from integer arithmetic
    val n = 40L
    val pairs = for {
      i <- 1L until n; j <- (i + 1) to n
      if (i * 7919 + j * 104729) % 5 == 0
    } yield (i, j)
    val expected = {
      val es = pairs.toSet
      val vs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val triCount = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        a <- vs; b <- vs if a < b; c <- vs if b < c
        if es((a, b)) && es((b, c)) && es((a, c))
      } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
      vs.map(v => v -> triCount(v)).toMap
    }
    for (parts <- Seq(1, 7)) {
      val got = Triangles.perVertex(edgesDf(pairs).repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"partitioning $parts")
    }
  }

  test("coOccurrenceEdges: ordered pairs within groups, duplicates collapse, whale groups truncate") {
    val df = Seq(
      (1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L), // dup item
      (2L, 5L), (2L, 6L),
      (3L, 9L)                                      // singleton: no pairs
    ).toDF("g", "item")
    val got = Triangles.coOccurrenceEdges(df, "g", "item", maxPerGroup = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 20L), (10L, 30L), (20L, 30L), (5L, 6L)))

    // whale group: 100 items but k=4 → C(4,2)=6 pairs among the 4 smallest
    val whale = (1L to 100L).map(i => (9L, i)).toDF("g", "item")
    val cut = Triangles.coOccurrenceEdges(whale, "g", "item", maxPerGroup = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("whale hub: a star core plus one closing edge stays bounded and exact") {
    // star: hub 0 connected to 1..200; one edge (1,2) closes one triangle.
    // Orientation sends every star edge OUT of the leaf (degree 1 or 2 <
    // hub degree), so the hub generates no wedges — the curse-of-the-
    // last-reducer shape this operator exists to avoid.
    val star = (1L to 200L).map(i => (0L, i)) :+ (1L, 2L)
    val got = Triangles.perVertex(edgesDf(star))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 1L && got(1L) === 1L && got(2L) === 1L)
    assert((3L to 200L).forall(got(_) === 0L))
  }

  test("clustering coefficient: exact thirds, pendant NULL") {
    // triangle 1-2-3 with pendant 4 hanging off 3
    val got = Triangles.clusteringCoefficient(
        edgesDf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, Some(100000000L)), (2L, 2L, 1L, Some(100000000L)),
      (3L, 3L, 1L, Some(33333333L)), (4L, 1L, 0L, None)))
  }
}
