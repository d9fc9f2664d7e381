package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** IVF index verified by recall against the exact brute-force scorer (same
  * quantized dot + tiebreak, so full probing must reproduce it exactly).
  */
class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 10)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("full probing equals brute force exactly") {
    val index = IvfIndex.build(emb, nLists = 8)
    val exact = neighborSets(Similarity.bruteForceKnn(emb, queries, k = 5))
    val ivf = neighborSets(index.search(queries, k = 5, nProbe = 8))
    assert(ivf == exact)
  }

  test("partial probing keeps useful recall with bounded comparisons") {
    val index = IvfIndex.build(emb, nLists = 8)
    val exact = neighborSets(Similarity.bruteForceKnn(emb, queries, k = 5))
    val ivf = neighborSets(index.search(queries, k = 5, nProbe = 3))
    val recall = exact.map { case (q, nn) =>
      nn.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / nn.size
    }.sum / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // sanity: every list got members (quantizer isn't degenerate)
    assert(index.assigned.select("list").distinct().count() == 8)
  }

  test("salted probe join: single-list-heavy corpus, results identical to unsalted") {
    import spark.implicits._
    // adversarial clustered corpus: 200 vectors piled around one direction
    // (one inverted list swallows nearly everything) + a few outliers
    val rows = (0L until 200L).map { i =>
      (i, Array(1.0f + i * 1e-6f, 0.0f, 0.0f))
    } ++ Seq((200L, Array(-1.0f, 0.0f, 0.0f)), (201L, Array(0.0f, -1.0f, 0.0f)),
      (202L, Array(0.0f, 0.0f, -1.0f)))
    val corpus = rows.toDF("vec_id", "embedding")
    val index = IvfIndex.build(corpus, nLists = 4)
    val hot = index.assigned.groupBy("list").count()
      .orderBy(col("count").desc).first().getLong(1)
    assert(hot >= 100, s"corpus not skewed enough for the test (hot list $hot)")
    val qs = corpus.where(col("vec_id") < 5 || col("vec_id") >= 200L)
    val unsalted = index.search(qs, k = 3, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue, r.getLong(2))).toSet
    val salted = index.search(qs, k = 3, nProbe = 4, saltBuckets = 8)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue, r.getLong(2))).toSet
    assert(salted == unsalted)
    val saltedInt8 = index.searchInt8(qs, k = 3, nProbe = 4, saltBuckets = 8)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue, r.getLong(2))).toSet
    val unsaltedInt8 = index.searchInt8(qs, k = 3, nProbe = 4)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].longValue, r.getLong(2))).toSet
    assert(saltedInt8 == unsaltedInt8)
  }

  test("sampled-training build: full probing still equals brute force") {
    // the identity is centroid-independent — full probe scores every vector
    // whatever the (sampled) k-means converged to — so the 100 TB-scale
    // build path (train on a fraction, assign everything) loses nothing
    val index = IvfIndex.build(emb, nLists = 8, trainFraction = 0.2)
    val exact = neighborSets(Similarity.bruteForceKnn(emb, queries, k = 5))
    val ivf = neighborSets(index.search(queries, k = 5, nProbe = 8))
    assert(ivf == exact)
    // every corpus vector got assigned a list despite the sampled training
    assert(index.assigned.count() == emb.count())
  }

  test("incremental add: assignment identical to a fresh build with the same centroids") {
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    val grown = IvfIndex.build(half, nLists = 8).add(rest)
    // every vector landed, assigned by the SAME rule a full build applies
    val full = grown.copy(assigned = emb.select(
      col("vec_id"), col("embedding"),
      graft.functions.NearestCentroid(col("embedding"), grown.centroids).as("list")))
    val a = grown.assigned.select("vec_id", "list").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = full.assigned.select("vec_id", "list").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
    // and full-probe search over the grown index is still exact
    val exact = neighborSets(Similarity.bruteForceKnn(emb, queries, k = 5))
    assert(neighborSets(grown.search(queries, k = 5, nProbe = 8)) === exact)
  }

  test("IVF-PQ: full probe equals plain ADC search; partial probe returns ADC-ranked subsets") {
    val cb = ProductQuantizer.gridCodebook(m = 8, subDim = 8, ksub = 8, lo = -0.5, hi = 0.5)
    val index = IvfIndex.build(emb, nLists = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2), r.getDouble(3))).toSet
    val full = rows(index.searchPq(cb, queries, k = 5, nProbe = 8))
    val plain = rows(cb.search(cb.encode(emb, "vec_id", "embedding"), queries, k = 5))
    assert(full === plain)
    // the precomputed-codes serving path is the same search
    val stored = index.pqCodes(cb)
    assert(rows(index.searchPq(cb, queries, k = 5, nProbe = 8, Some(stored))) === full)
    // partial probe: every hit must come from one of the query's nProbe
    // nearest lists (recomputed here from the centroids in plain Scala),
    // and per-query results stay ADC-distance-sorted
    val nProbe = 2
    val assignedList = index.assigned.select("vec_id", "list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queryVecs = queries.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def probed(v: Seq[Float]): Set[Int] =
      index.centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.sortBy(identity).take(nProbe).map(_._2).toSet
    val part = index.searchPq(cb, queries, k = 5, nProbe = nProbe)
      .orderBy("query_id", "rank").collect()
    assert(part.nonEmpty)
    part.foreach { r =>
      assert(probed(queryVecs(r.getLong(0))).contains(assignedList(r.getLong(2))),
        s"hit ${r.getLong(2)} not in query ${r.getLong(0)}'s probed lists")
    }
    part.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getAs[Number](1).longValue()).map(_.getDouble(3))
      assert(ds.sameElements(ds.sorted))
    }
  }

  test("native assignment matches the centroid argmin definition") {
    val index = IvfIndex.build(emb, nLists = 4)
    val cs = index.centroids
    val rows = index.assigned.select("vec_id", "embedding", "list")
      .where(col("vec_id") < 50).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val dists = cs.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(r.getInt(2) == dists.indexOf(dists.min),
        s"vec ${r.getLong(0)} assigned ${r.getInt(2)}, argmin ${dists.indexOf(dists.min)}")
    }
  }

  test("full-probe int8 search equals int8 brute force (centroid-independent)") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val index = IvfIndex.build(emb, nLists = 4)
    val got = index.searchInt8(emb.where(col("vec_id") < 5), k = 6, nProbe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    val brute = EmbeddingOps.int8Knn(emb, emb.where(col("vec_id") < 5), k = 6)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === brute)
  }
}
