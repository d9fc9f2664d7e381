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
}
