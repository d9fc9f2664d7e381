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
