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
    *
    * `maxCluster` bounds the DEGENERATE cluster (the
    * [[Dedup.dedupMinhashPairs]] maxBucket discipline): per-cluster pair
    * cost is O(c²), so a one-mode corpus that lands ~all N rows in one
    * cluster goes quadratic on a single join key. With a cap, the
    * comparison LEFT side shrinks to each cluster's `maxCluster`
    * LOWEST-ID representatives (a partial-agg'd bounded BottomK — a whale
    * cluster collapses map-side, never a window sort) and every member
    * still tests against them — per-cluster cost falls from c² to c·cap.
    * The approximation is honest, not silent: a row whose ONLY
    * above-threshold earlier neighbors are non-representatives is kept
    * when the exact rule would drop it (dups are only ever missed, never
    * invented) — audit with [[clusterOverflow]] before trusting a capped
    * run. Default `Int.MaxValue` = exact (uncapped).
    */
  def dedupAssigned(assigned: DataFrame, minScore: Long,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    clusterCol: String = "cluster",
                    maxCluster: Int = Int.MaxValue): DataFrame = {
    require(maxCluster > 0, s"maxCluster must be positive, got $maxCluster")
    if (maxCluster != Int.MaxValue) {
      val t = assigned.schema(idCol).dataType
      require(Seq("bigint", "int", "smallint", "tinyint").contains(t.simpleString),
        s"maxCluster needs an integral id column (BottomK buffers longs); " +
          s"$idCol is ${t.catalogString} — run uncapped or map ids to longs first")
    }
    val slim = assigned.select(col(idCol), col(vecCol), col(clusterCol))
    val leftSide =
      if (maxCluster == Int.MaxValue) slim
      else {
        val reps = slim.where(col(clusterCol).isNotNull)
          .groupBy(col(clusterCol))
          .agg(graft.functions.BottomK(maxCluster)(col(idCol)).as("__reps"))
          .select(col(clusterCol), explode(col("__reps")).as(idCol))
        slim.join(reps, Seq(idCol, clusterCol), "left_semi")
      }
    val dups = leftSide.as("a").join(slim.as("b"),
        col(s"a.$clusterCol") === col(s"b.$clusterCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .where(Similarity.quantizedDot(col(s"a.$vecCol"), col(s"b.$vecCol")) >= minScore)
      .select(col(s"b.$idCol").as(idCol)).distinct()
    assigned.select(col(idCol), col(clusterCol))
      .join(dups.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col(clusterCol), col("__dup").isNull.as("keep"))
  }

  /** Audit for a capped [[dedupAssigned]] run: the clusters whose
    * population exceeds `maxCluster` — exactly where the cap
    * approximates (a non-representative pair may be missed). Empty
    * result ⇒ the capped run was exact. One partial-agg'd count shuffle;
    * NULL clusters never pair, so they are never at risk and never
    * reported.
    */
  def clusterOverflow(assigned: DataFrame, maxCluster: Int,
                      clusterCol: String = "cluster"): DataFrame = {
    require(maxCluster > 0, s"maxCluster must be positive, got $maxCluster")
    assigned.where(col(clusterCol).isNotNull)
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxCluster)
  }

  /** SemDeDup with explicit (quantized-space) centroids — the
    * deterministic, oracle-checkable form.
    */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]], minScore: Long,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    maxCluster: Int = Int.MaxValue): DataFrame =
    dedupAssigned(assignQuantized(corpus, centroids, idCol, vecCol), minScore,
      idCol, vecCol, maxCluster = maxCluster)

  /** SemDeDup with k-means-trained centroids (the paper's configuration):
    * trains the coarse quantizer exactly like [[IvfIndex.build]] (sampled
    * training, codegen'd assignment) and applies the same keep rule.
    * Float-iterative training means this form is spec-verified rather than
    * cross-engine hashed — same split as IVF/PQ fit.
    *
    * `nClusters ≤ 0` = AUTO: `⌈√n⌉` centroids over the corpus row count —
    * the balanced-cluster default that keeps expected per-cluster pair
    * cost near n (√n clusters of ~√n rows each; the paper's LAION config
    * sits in the same regime). Costs one count() pass before training.
    */
  def semanticDedupKMeans(corpus: DataFrame, nClusters: Int, minScore: Long,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          trainFraction: Double = 1.0, maxIter: Int = 8,
                          seed: Long = 42L,
                          maxCluster: Int = Int.MaxValue): DataFrame = {
    val k =
      if (nClusters > 0) nClusters
      else math.max(1, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
    val idx = IvfIndex.build(corpus, k, idCol, vecCol, seed, maxIter, trainFraction)
    // k-means centroids live in RAW space; scale into quantized units so
    // assignment and scoring share one vector representation
    val scaled = idx.centroids.map(_.map(_ * Similarity.QuantScale))
    semanticDedup(corpus, scaled, minScore, idCol, vecCol, maxCluster)
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
