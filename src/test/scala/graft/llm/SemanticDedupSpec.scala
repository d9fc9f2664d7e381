package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SemDeDup verified against a local replay of the paper's upper-triangular
  * rule, plus the scale contracts: equi-join pair stage (never a cartesian),
  * partitioning independence, threshold monotonicity, and the k-means
  * configuration.
  */
class SemanticDedupSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val cents = SemanticDedup.signCentroids(Seq(1, 17, 33), dim = 64)
  private val MinScore = 30000000L

  private def keepMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
    df.select("vec_id", "cluster", "keep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("keep flag replays the upper-triangular rule exactly") {
    val got = keepMap(SemanticDedup.semanticDedup(emb, cents, MinScore))

    // local brute-force replay over the same quantized integers
    val rows = SemanticDedup.assignQuantized(emb, cents)
      .select("vec_id", "embedding", "cluster").collect()
      .map { r =>
        val qv = r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.QuantScale).toLong).toArray
        (r.getLong(0), qv, r.getLong(2))
      }.sortBy(_._1)
    val expected = rows.map { case (id, qv, cl) =>
      val dup = rows.exists { case (jid, jqv, jcl) =>
        jcl == cl && jid < id &&
          qv.zip(jqv).map { case (a, b) => a * b }.sum >= MinScore
      }
      id -> (cl, !dup)
    }.toMap
    assert(got == expected)
  }

  test("assignment is the nearest centroid with lowest-index tiebreak") {
    val rows = SemanticDedup.assignQuantized(emb, cents)
      .select("vec_id", "embedding", "cluster").collect()
    rows.foreach { r =>
      val qv = r.getSeq[Float](1).map(x => math.floor(x.toDouble * Similarity.QuantScale)).toArray
      val dists = cents.map(c => qv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(r.getLong(2) == dists.indexOf(dists.min))
    }
  }

  test("result is independent of input partitioning") {
    val a = keepMap(SemanticDedup.semanticDedup(emb.repartition(7), cents, MinScore))
    val b = keepMap(SemanticDedup.semanticDedup(emb.repartition(3), cents, MinScore))
    assert(a == b)
  }

  test("a higher threshold never drops a row a lower one kept") {
    val loose = keepMap(SemanticDedup.semanticDedup(emb, cents, MinScore))
    val strict = keepMap(SemanticDedup.semanticDedup(emb, cents, MinScore * 2))
    loose.foreach { case (id, (_, keep)) => if (keep) assert(strict(id)._2) }
  }

  test("pair stage is an equi-join on the cluster id, never a cartesian") {
    val plan = SemanticDedup.semanticDedup(emb, cents, MinScore)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("null, null-element, and empty vectors take a NULL cluster and are kept") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Option(10.0f), Option(0.0f))),
      (2L, Seq(Option(10.0f), Option(0.0f))),          // dup of 1 → dropped
      (3L, null.asInstanceOf[Seq[Option[Float]]]),     // null vector
      (4L, Seq.empty[Option[Float]]),                  // empty vector
      (5L, Seq(Option(10.0f), Option.empty[Float])))   // null element
      .toDF("vec_id", "embedding")
    val c2 = SemanticDedup.signCentroids(Seq(0), dim = 2)
    val got = SemanticDedup.semanticDedup(df, c2, minScore = 1L).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2))).toMap
    assert(got.size == 5)
    assert(got(1L)._1 >= 0 && got(1L)._2, "first of the dup pair is kept")
    assert(got(2L) == (got(1L)._1, false), "later identical vector is dropped")
    Seq(3L, 4L, 5L).foreach { id =>
      assert(got(id) == (-1L, true), s"row $id must take NULL cluster and be kept")
    }
  }

  test("maxCluster cap on a one-mode corpus: dups only missed, never invented; audit row") {
    import spark.implicits._
    // every vector lands in ONE cluster (positive dim-0, ±1000 centroids):
    // the adversarial shape where uncapped pair cost is c²
    val oneCent = SemanticDedup.signCentroids(Seq(0), dim = 4)
    val rows = Seq(
      (1L, Array(10f, 100f, 0f, 0f)),   // rep; similar to nothing
      (2L, Array(10f, -100f, 0f, 0f)),  // rep; similar to nothing
      (3L, Array(10f, 0f, 100f, 0f)),   // non-rep
      (4L, Array(10f, 0f, 100f, 0f)))   // non-rep, exact dup of 3
      .toDF("vec_id", "embedding")
    val thr = 100000000000L // 1e11: only the 3·4 dot (≈1.01e12) qualifies
    val exact = keepMap(SemanticDedup.semanticDedup(rows, oneCent, thr))
    assert(exact.view.mapValues(_._2).toMap ==
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
    // cap = 2: reps are the two LOWEST ids {1, 2}; the only qualifying
    // pair (3, 4) is rep-free, so the cap honestly misses it — 4 is KEPT,
    // and nothing the exact rule kept is ever dropped
    val capped = keepMap(SemanticDedup.semanticDedup(rows, oneCent, thr, maxCluster = 2))
    assert(capped.view.mapValues(_._2).toMap ==
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> true))
    exact.foreach { case (id, (_, keep)) =>
      if (keep) assert(capped(id)._2, s"cap must never drop exact-kept row $id")
    }
    // the audit names exactly the whale cluster and its population
    val assigned = SemanticDedup.assignQuantized(rows, oneCent)
    val audit = SemanticDedup.clusterOverflow(assigned, maxCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(audit.toSeq == Seq((assigned.select("cluster").first().getLong(0), 4L)))
    // cap at-or-above the cluster size: exact result, empty audit
    val wide = keepMap(SemanticDedup.semanticDedup(rows, oneCent, thr, maxCluster = 4))
    assert(wide == exact)
    assert(SemanticDedup.clusterOverflow(assigned, maxCluster = 4).isEmpty)
  }

  test("maxCluster on the gate corpus: capped keep set contains the exact keep set") {
    val exact = keepMap(SemanticDedup.semanticDedup(emb, cents, MinScore))
    val capped = keepMap(SemanticDedup.semanticDedup(emb, cents, MinScore, maxCluster = 3))
    assert(capped.keySet == exact.keySet)
    exact.foreach { case (id, (cl, keep)) =>
      assert(capped(id)._1 == cl)
      if (keep) assert(capped(id)._2, s"capped run dropped exact-kept row $id")
    }
  }

  test("auto cluster count: nClusters <= 0 trains ceil(sqrt(n)) centroids") {
    val out = SemanticDedup.semanticDedupKMeans(
      emb, nClusters = 0, minScore = MinScore, trainFraction = 0.5, maxIter = 2)
    val m = keepMap(out)
    assert(m.size == emb.count())
    val nClusters = m.values.map(_._1).toSet.size
    val bound = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    assert(nClusters <= bound, s"auto trains at most ⌈√n⌉ = $bound clusters, got $nClusters")
  }

  test("k-means configuration: full coverage and one survivor per ε-ball") {
    val out = SemanticDedup.semanticDedupKMeans(
      emb, nClusters = 8, minScore = MinScore, trainFraction = 0.5, maxIter = 3)
    val m = keepMap(out)
    assert(m.size == emb.count())
    // the lowest id of every cluster has no earlier cluster-mate → always kept
    m.groupBy(_._2._1).foreach { case (_, members) =>
      val lowest = members.keys.min
      assert(members(lowest)._2, s"lowest id $lowest of its cluster must be kept")
    }
  }
}
