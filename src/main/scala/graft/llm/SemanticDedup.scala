package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): partition the corpus by a coarse quantizer (nearest
  * centroid), then inside each cluster drop every item whose similarity to
  * some EARLIER (lower-id) cluster-mate reaches the threshold — the paper's
  * upper-triangular rule, which keeps exactly one representative per ε-ball
  * while never comparing across clusters.
  *
  * Scale shape (the reason the paper clusters at all): pair comparisons are
  * confined to clusters — O(Σ c²) over cluster sizes c, never corpus
  * all-pairs. The centroid set is tiny and ships with the plan (same
  * [[graft.functions.NearestCentroid]] codegen'd assignment as the IVF
  * index); the pair stage is a plain equi-join on the cluster id, so it
  * shuffles each row once keyed by cluster. At 100 TB one runs this with
  * a cluster count near √n (the paper uses ~11k for LAION) so clusters stay
  * small; a degenerate whale cluster is a salting candidate — see
  * SCALING.md. Scores use the exact-integer quantized dot
  * ([[graft.functions.QuantizedDot]]), so results are engine-replayable.
  *
  * Determinism contract: assignment runs over floor(x·QuantScale) vectors
  * (exact integers carried as doubles — every distance < 2⁵³ so IEEE double
  * arithmetic IS integer arithmetic), ties broken toward the lowest
  * centroid index; the keep rule orders by id. Both are exactly
  * reproducible in ANSI SQL ([[oracle]]).
  *
  * Reference anchor: extends the dedup family (fabrix has no ANN/dedup —
  * SURVEY §2.11 extensions); clusters via the same coarse-quantizer
  * machinery as [[IvfIndex]] (fabrix-core/src/fabrix.rs is the DataFrame
  * carrier the family hangs off).
  */
object SemanticDedup {

  /** 2^activeDims.length sign-pattern centroids in QUANTIZED space: centroid
    * `c` has component `±mag` at each active dim (sign = bit of `c`), zero
    * elsewhere. Deterministic literals that split a zero-centered embedding
    * corpus into balanced clusters — the gate's stand-in for trained
    * centroids (the operator treats centroids as opaque data, exactly like
    * [[ProductQuantizer.gridCodebook]] stands in for a trained codebook).
    */
  def signCentroids(activeDims: Seq[Int], dim: Int, mag: Double = 1000.0): Array[Array[Double]] = {
    require(activeDims.nonEmpty && activeDims.forall(d => d >= 0 && d < dim),
      s"activeDims must be within [0, $dim), got $activeDims")
    Array.tabulate(1 << activeDims.length) { c =>
      val v = new Array[Double](dim)
      activeDims.zipWithIndex.foreach { case (d, i) =>
        v(d) = if (((c >> i) & 1) == 1) mag else -mag
      }
      v
    }
  }

  /** Corpus + cluster id, assignment over the exact-integer quantized
    * vectors (cross-engine replayable; see class doc). Centroids are in
    * quantized units (raw value × QuantScale).
    */
  def assignQuantized(corpus: DataFrame, centroids: Array[Array[Double]],
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // floor(x·scale) kept as double: exact integers, and NearestCentroid's
    // double-space L2 over them is exact integer arithmetic
    val qv = transform(col(vecCol),
      x => floor(x.cast(DoubleType) * Similarity.QuantScale).cast(DoubleType))
    corpus.withColumn("cluster",
      graft.functions.NearestCentroid(qv, centroids).cast("long"))
  }

  /** The upper-triangular keep rule over an already-clustered corpus:
    * `keep(i) ⇔ ¬∃ j: cluster(j)=cluster(i) ∧ j.id < i.id ∧ dot(i,j) ≥
    * minScore`. Output: (idCol, cluster, keep) for every input row. Rows
    * with a NULL cluster (null/empty vector) never pair and are kept.
    */
  def dedupAssigned(assigned: DataFrame, minScore: Long,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    clusterCol: String = "cluster"): DataFrame = {
    val slim = assigned.select(col(idCol), col(vecCol), col(clusterCol))
    val dups = slim.as("a").join(slim.as("b"),
        col(s"a.$clusterCol") === col(s"b.$clusterCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(Similarity.quantizedDot(col(s"a.$vecCol"), col(s"b.$vecCol")) >= minScore)
      .select(col(s"b.$idCol").as(idCol)).distinct()
    assigned.select(col(idCol), col(clusterCol))
      .join(dups.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col(clusterCol), col("__dup").isNull.as("keep"))
  }

  /** SemDeDup with explicit (quantized-space) centroids — the
    * deterministic, oracle-checkable form.
    */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]], minScore: Long,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    dedupAssigned(assignQuantized(corpus, centroids, idCol, vecCol), minScore, idCol, vecCol)

  /** SemDeDup with k-means-trained centroids (the paper's configuration):
    * trains the coarse quantizer exactly like [[IvfIndex.build]] (sampled
    * training, codegen'd assignment) and applies the same keep rule.
    * Float-iterative training means this form is spec-verified rather than
    * cross-engine hashed — same split as IVF/PQ fit.
    */
  def semanticDedupKMeans(corpus: DataFrame, nClusters: Int, minScore: Long,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          trainFraction: Double = 1.0, maxIter: Int = 8,
                          seed: Long = 42L): DataFrame = {
    val idx = IvfIndex.build(corpus, nClusters, idCol, vecCol, seed, maxIter, trainFraction)
    // k-means centroids live in RAW space; scale into quantized units so
    // assignment and scoring share one vector representation
    val scaled = idx.centroids.map(_.map(_ * Similarity.QuantScale))
    semanticDedup(corpus, scaled, minScore, idCol, vecCol)
  }

  // ------------------------------------------------- DuckDB oracle SQL ----

  /** Replays [[semanticDedup]] exactly: same quantization, same integer L2
    * argmin (first-minimum tiebreak via row_number ordered (dist, cid)),
    * same integer dot threshold, same keep rule.
    */
  def oracle(table: String, idCol: String, vecCol: String,
             centroids: Array[Array[Double]], minScore: Long, dim: Int): String = {
    val cvals = centroids.zipWithIndex.map { case (c, i) =>
      // centroid components are integer-valued by contract; emit as BIGINTs
      s"($i, CAST([${c.map(_.toLong).mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""WITH b AS (
  SELECT $idCol, list_transform($vecCol,
    x -> CAST(floor(CAST(x AS DOUBLE) * ${Similarity.QuantScale}) AS BIGINT)) AS qv
  FROM $table),
c(cid, cv) AS (VALUES
    $cvals),
d AS (
  SELECT $idCol, qv, cid,
    list_sum(list_transform(generate_series(1, $dim), i -> (qv[i]-cv[i])*(qv[i]-cv[i]))) AS dist
  FROM b CROSS JOIN c),
a AS (
  -- a NULL dist (null/empty vector, or a null element) is NULL for EVERY
  -- centroid of that row; match the operator's contract (NULL cluster,
  -- never pairs, kept) instead of letting NULLS-LAST rank hand it cid 0
  SELECT $idCol, qv, CASE WHEN dist IS NULL THEN NULL ELSE cid END AS cid FROM (
    SELECT $idCol, qv, cid, dist,
      row_number() OVER (PARTITION BY $idCol ORDER BY dist ASC, cid ASC) AS rn
    FROM d) WHERE rn = 1),
p AS (
  SELECT DISTINCT y.$idCol
  FROM a x JOIN a y ON x.cid = y.cid AND x.$idCol < y.$idCol
  WHERE CAST(list_sum(list_transform(generate_series(1, $dim), i -> x.qv[i]*y.qv[i])) AS BIGINT) >= $minScore)
SELECT a.$idCol, CAST(a.cid AS BIGINT) AS cluster, p.$idCol IS NULL AS keep
FROM a LEFT JOIN p ON a.$idCol = p.$idCol
ORDER BY a.$idCol""".stripMargin
  }
}
