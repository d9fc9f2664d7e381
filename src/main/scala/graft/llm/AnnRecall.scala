package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-checkable ANN recall — the measurement loop every approximate
  * index needs before anyone trusts its speedup: how many of the TRUE
  * top-k does a partial-probe IVF search return?
  *
  * [[IvfIndex]]'s k-means quantizer is float-iterative, so its probe
  * decisions can't be replayed bit-exactly by another engine — which is
  * why its recall lived in specs only. This operator pins recall
  * END-TO-END by building the IVF over EXACT INTEGER geometry instead:
  * centroids are the int8 codes of `centroidIds` corpus vectors
  * (list index = position in the seq), assignment/probing use exact
  * integer squared-L2 with a (distance, list) tiebreak, and candidate
  * scoring is the exact int8 dot of [[EmbeddingOps.int8Knn]]. Every
  * decision is integer arithmetic — DuckDB replays all of it.
  *
  * The gate is a DIFFERENT construction on each side: the Spark side
  * literally intersects the IVF result set with the brute-force top-k
  * (the honest recall measurement a pipeline would run); the oracle uses
  * the containment identity — a true neighbor is recalled IFF its list
  * is probed (probed ⇒ its rank among the probed subset is ≤ its global
  * rank ≤ k, so it's in the IVF top-k; unprobed ⇒ it's not a candidate
  * at all; both need the total (score desc, id asc) order). Hash
  * equality therefore proves the identity AND both pipelines at once.
  *
  * Scale shape: centroid codes are nLists × dim ints collected once
  * (contractually tiny, the control-arm precedent); assignment and probe
  * ranking are scan-stage expressions over the code attribute; the
  * search is the [[IvfIndex]] probe equi-join on the list id; both
  * top-k paths ride the bounded-buffer [[graft.functions.TopK]]
  * aggregate; the final recall join is k rows per query.
  */
object AnnRecall {

  /** Exact integer squared L2 between an int8 code attribute and a fixed
    * centroid code. Max (254²)·dim — long-safe far past any real dim.
    */
  private def dist2(code: Column, cent: Array[Int]): Column =
    aggregate(
      zip_with(code, array(cent.map(lit).toIndexedSeq: _*),
        (a, b) => (a.cast("long") - b) * (a.cast("long") - b)),
      lit(0L), (acc, x) => acc + x)

  /** (distance, list) structs for every centroid — array_sort's struct
    * order IS the (d asc, list asc) deterministic ranking.
    */
  private def distArray(code: Column, cents: Seq[Array[Int]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(code, c).as("d"), lit(i).as("l"))
    }.toIndexedSeq: _*)

  /** (query_id, hits): how many of each query's brute-force int8 top-k
    * the partial-probe IVF search returns. `hits = k` means perfect
    * recall at this nProbe. Queries must be corpus rows (self excluded
    * both paths); `centroidIds` must exist in the corpus and be distinct.
    */
  def int8IvfRecall(corpus: DataFrame, queries: DataFrame,
                    centroidIds: Seq[Long], k: Int, nProbe: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(centroidIds.nonEmpty && centroidIds.distinct.length == centroidIds.length,
      "centroidIds must be non-empty and distinct")
    require(nProbe >= 1 && nProbe <= centroidIds.length,
      s"nProbe must be in [1, ${centroidIds.length}], got $nProbe")
    val centRows = corpus.where(col(idCol).isin(centroidIds: _*))
      .select(col(idCol), EmbeddingOps.quantizeInt8(col(vecCol)).as("__c"))
      .collect()
    require(centRows.length == centroidIds.length,
      s"centroid vectors missing from corpus: wanted ${centroidIds.length}, " +
        s"found ${centRows.length}")
    val byId = centRows.map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val cents = centroidIds.map(byId)

    val assigned = corpus
      .select(col(idCol).as("neighbor_id"),
        EmbeddingOps.quantizeInt8(col(vecCol)).as("cc"))
      .withColumn("__ds", distArray(col("cc"), cents))
      .withColumn("list", element_at(array_sort(col("__ds")), 1).getField("l"))
      .drop("__ds")
    val probes = queries
      .select(col(idCol).as("query_id"),
        EmbeddingOps.quantizeInt8(col(vecCol)).as("qc"))
      .withColumn("__ds", distArray(col("qc"), cents))
      .select(col("query_id"), col("qc"),
        explode(slice(transform(array_sort(col("__ds")), s => s.getField("l")),
          1, nProbe)).as("list"))
    val dot = aggregate(
      zip_with(col("qc"), col("cc"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = probes.join(assigned, "list")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot.as("score"))
    val ivf = graft.functions.TopK
      .perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("id").as("neighbor_id"), lit(1).as("__hit"))
    EmbeddingOps.int8Knn(corpus, queries, k, idCol, vecCol)
      .select("query_id", "neighbor_id")
      .join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(col("__hit")).as("hits"))
  }

  /** DuckDB replay via the containment identity (see object doc): brute
    * top-k joined to the integer-argmin assignment, hits = members whose
    * list lands in the query's first-nProbe ranking.
    */
  def oracleSql(table: String, idCol: String, vecCol: String,
                queryPred: String, centroidIds: Seq[Long], k: Int,
                nProbe: Int, dim: Int): String = {
    val centVals = centroidIds.zipWithIndex
      .map { case (cid, i) => s"($i, $cid)" }.mkString(", ")
    s"""WITH t AS (SELECT $idCol, $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m FROM $table),
q8 AS (SELECT $idCol, ${EmbeddingOps.quantSql("v", "m")} AS qc FROM t),
cent AS (SELECT cm.list, q8.qc FROM (VALUES $centVals) AS cm(list, cid)
  JOIN q8 ON q8.$idCol = cm.cid),
ad AS (SELECT v.$idCol AS vid, c.list,
  CAST(list_sum(list_transform(generate_series(1,$dim),
    i -> CAST(v.qc[i] - c.qc[i] AS BIGINT) * CAST(v.qc[i] - c.qc[i] AS BIGINT))) AS BIGINT) AS d
  FROM q8 v CROSS JOIN cent c),
asn AS (SELECT vid, list FROM (
  SELECT vid, list, row_number() OVER (PARTITION BY vid ORDER BY d, list) AS rn
  FROM ad) WHERE rn = 1),
probes AS (SELECT vid AS query_id, list FROM (
  SELECT vid, list, row_number() OVER (PARTITION BY vid ORDER BY d, list) AS rn
  FROM ad WHERE vid IN (SELECT $idCol FROM $table WHERE $queryPred)) WHERE rn <= $nProbe),
s AS (SELECT a.$idCol AS query_id, b.$idCol AS neighbor_id,
  CAST(list_sum(list_transform(generate_series(1,$dim), i -> a.qc[i] * b.qc[i])) AS BIGINT) AS score
  FROM q8 a JOIN q8 b ON a.$idCol != b.$idCol
  WHERE a.$idCol IN (SELECT $idCol FROM $table WHERE $queryPred)),
brute AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s) WHERE rank <= $k)
SELECT b.query_id, CAST(count(p.list) AS BIGINT) AS hits
FROM brute b
JOIN asn a ON b.neighbor_id = a.vid
LEFT JOIN probes p ON p.query_id = b.query_id AND p.list = a.list
GROUP BY b.query_id ORDER BY b.query_id""".stripMargin
  }
}
