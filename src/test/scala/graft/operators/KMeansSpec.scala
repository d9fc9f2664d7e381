package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd k-means: a hand-traced 1-D run, the lower-cluster tie rule,
  * sign-split truncating means, empty-cluster carry, contracts.
  */
class KMeansSpec extends SparkSpec {

  import spark.implicits._

  private def pts(vs: Long*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong + 1, Seq(v)) }
      .toDF("id", "v")

  test("hand-traced two-round 1-D run: centroids and final distances") {
    val df = pts(0L, 2L, 10L, 12L)
    // init c0=[0], c1=[2]; r1: {0}|{2,10,12} -> c=[0],[8];
    // r2: {0,2}|{10,12} -> c=[1],[11]; final assign all at dist2 1
    val got = KMeans.lloydAssign(df, "id", "v", k = 2, rounds = 2, dim = 1)
      .orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 1L))
    assert(got.forall(_.getLong(2) == 1L))
    val cents = KMeans.lloydCentroids(df, "id", "v", 2, 2, 1)
      .orderBy("cluster").collect().map(_.getLong(2)).toSeq
    assert(cents == Seq(1L, 11L))
  }

  test("equidistant points break ties to the lower cluster index") {
    // centroids stay [0] and [4] (each a singleton); 2 is equidistant
    val df = Seq((1L, Seq(0L)), (2L, Seq(4L)), (3L, Seq(2L)))
      .toDF("id", "v")
    val got = KMeans.lloydAssign(df, "id", "v", k = 2, rounds = 0, dim = 1)
      .orderBy("id").collect()
    assert(got(2).getLong(1) == 0L && got(2).getLong(2) == 4L)
  }

  test("centroid means are sign-split truncating (toward zero)") {
    val df = Seq((1L, Seq(-3L)), (2L, Seq(-4L))).toDF("id", "v")
    // init c0=[-3], c1=[-4]; but k=1 keeps one cluster: mean of -7/2 = -3
    val cents = KMeans.lloydCentroids(df, "id", "v", k = 1, rounds = 1, dim = 1)
      .collect().map(_.getLong(2)).toSeq
    assert(cents == Seq(-3L))
  }

  test("an empty cluster keeps its previous centroid and can recover") {
    // both inits are [0]: round 1 ties everything to cluster 0 (c0=33,
    // c1 starves and CARRIES [0]); round 2 the carried centroid wins the
    // zeros back (c1=0, c0=99) — without the carry, cluster 1 would die
    val df = Seq((1L, Seq(0L)), (2L, Seq(0L)), (3L, Seq(99L)))
      .toDF("id", "v")
    val after1 = KMeans.lloydCentroids(df, "id", "v", k = 2, rounds = 1, dim = 1)
      .orderBy("cluster").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after1 == Map(0L -> 33L, 1L -> 0L))
    val after3 = KMeans.lloydCentroids(df, "id", "v", k = 2, rounds = 3, dim = 1)
      .orderBy("cluster").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after3 == Map(0L -> 99L, 1L -> 0L))
  }

  test("2-D distances use exact squared L2") {
    val df = Seq((1L, Seq(0L, 0L)), (2L, Seq(6L, 8L)), (3L, Seq(3L, 3L)))
      .toDF("id", "v")
    val got = KMeans.lloydAssign(df, "id", "v", k = 2, rounds = 0, dim = 2)
      .orderBy("id").collect()
    assert(got(2).getLong(1) == 0L && got(2).getLong(2) == 18L) // vs 34
  }

  test("ragged or null-element vectors raise; too few rows raise") {
    val ragged = Seq((1L, Seq(1L, 2L)), (2L, Seq(1L))).toDF("id", "v")
    val e = intercept[Exception] {
      KMeans.lloydAssign(ragged, "id", "v", 2, 1, 2).collect()
    }
    assert(e.getMessage.contains("exactly 2 non-null"))
    val tiny = Seq((1L, Seq(1L))).toDF("id", "v")
    val e2 = intercept[Exception] {
      KMeans.lloydAssign(tiny, "id", "v", 5, 1, 1).collect()
    }
    assert(e2.getMessage.contains("at least k=5"))
  }
}
