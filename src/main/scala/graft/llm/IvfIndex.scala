package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** IVF (inverted-file) approximate nearest neighbor — the scale path beyond
  * sign-LSH: a coarse k-means quantizer assigns every vector to its nearest
  * centroid; queries search only the `nProbe` closest inverted lists.
  *
  * Scale shape: centroids are tiny (nLists × dim floats) and broadcast; list
  * assignment is one codegen-friendly pass over the corpus; the search join
  * is an equi-join on the list id, so comparisons are O(Σ probed-list sizes)
  * — never all-pairs. Recall/latency trades via nLists (bigger = finer
  * partitioning) and nProbe (more lists = higher recall).
  *
  * KMeans is seeded, so the index is deterministic for a fixed corpus +
  * partitioning; it is still float-iterative, hence spec-verified by recall
  * against [[Similarity.bruteForceKnn]] rather than a bit-exact oracle.
  */
final case class IvfIndex(
    assigned: DataFrame,              // idCol, vecCol, list
    centroids: Array[Array[Double]],  // nLists × dim
    idCol: String, vecCol: String) {

  /** Distance of a vector column to centroid c (squared L2, doubles). */
  private def distTo(vec: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(c), (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Rank of each list for a vector: array of list ids, nearest first. */
  def probeLists(vec: Column, nProbe: Int): Column = {
    val dists = array(centroids.indices.map(i => struct(distTo(vec, centroids(i)).as("d"), lit(i).as("l"))): _*)
    slice(transform(array_sort(dists), s => s.getField("l")), 1, nProbe)
  }

  /** The probe equi-join, optionally salted: a CLUSTERED corpus can pack
    * most vectors into one inverted list, and that hot `list` key then
    * serializes the candidate scoring onto few tasks. With
    * `saltBuckets > 0` the corpus side takes a uniform salt and the
    * (small) probe side replicates `saltBuckets`×, fanning the whale
    * list's comparisons across tasks — the join multiset (and therefore
    * every search result) is provably unchanged, so salting is a pure
    * balance knob. Measure first with
    * [[graft.operators.Profiling.keyConcentration]] on `assigned("list")`.
    */
  private def probeJoin(probes: DataFrame, corpus: DataFrame,
                        saltBuckets: Int): DataFrame =
    if (saltBuckets <= 0) probes.join(corpus, "list")
    else graft.operators.SkewJoin.saltedJoin(
      corpus, probes, "list", "list", saltBuckets)

  /** Approximate top-k: score queries only against vectors in their nProbe
    * nearest lists (equi-join on list id after exploding the probe set).
    * `saltBuckets` opts in to [[probeJoin]]'s hot-list salting.
    */
  def search(queries: DataFrame, k: Int, nProbe: Int,
             saltBuckets: Int = 0): DataFrame = {
    val q = queries.select(
        col(idCol).as("query_id"),
        col(vecCol).as("qv_q"),
        explode(probeLists(col(vecCol), nProbe)).as("list"))
    val scored = probeJoin(q, assigned.select(
          col(idCol).as("neighbor_id"), col(vecCol).as("qv"), col("list")), saltBuckets)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.quantizedDot(col("qv_q"), col("qv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType)).where(col("rank") <= k)
  }

  /** IVF over the COMPRESSED store (the FAISS IVF-flat-int8 shape): probe
    * routing uses the float centroids exactly as [[search]], but candidate
    * scoring runs on int8 codes ([[EmbeddingOps.quantizeInt8]]) with an
    * exact integer dot, and top-k flows through the bounded-buffer
    * [[graft.functions.TopK]] aggregate (≤k candidates per query leave each
    * map partition — no window sort of the scored pairs). At full probe
    * this provably equals int8 brute force whatever the centroids
    * converged to — which is what makes it oracle-checkable.
    */
  def searchInt8(queries: DataFrame, k: Int, nProbe: Int,
                 saltBuckets: Int = 0): DataFrame = {
    val q = queries.select(
        col(idCol).as("query_id"),
        EmbeddingOps.quantizeInt8(col(vecCol)).as("qc"),
        explode(probeLists(col(vecCol), nProbe)).as("list"))
    val c = assigned.select(
        col(idCol).as("neighbor_id"),
        EmbeddingOps.quantizeInt8(col(vecCol)).as("cc"), col("list"))
    val dot = aggregate(
      zip_with(col("qc"), col("cc"), (a, b) => a.cast(LongType) * b.cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val scored = probeJoin(q, c, saltBuckets)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot.as("score"))
    graft.functions.TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .withColumnRenamed("id", "neighbor_id")
  }

  /** The PQ-compressed corpus for [[searchPq]]: (neighbor_id, codes, list),
    * encoded ONCE (codegen'd PqEncode pass over the assigned frame) and
    * eagerly checkpointed. Compute per (index, codebook) and hand to every
    * [[searchPq]] call — this is the FAISS IndexIVFPQ shape, where codes
    * are stored at build/add time so a search touches only probed lists,
    * never the float corpus.
    */
  def pqCodes(pq: PqCodebook): DataFrame =
    assigned.select(
        col(idCol).as("neighbor_id"),
        graft.functions.PqEncode(col(vecCol), pq.codebooks).as("codes"),
        col("list"))
      .localCheckpoint(true)

  /** IVF-PQ — the standard big-corpus ANN shape (FAISS IndexIVFPQ):
    * coarse-centroid probe routing exactly as [[search]], candidate
    * scoring by ADC over the PQ-compressed codes ([[PqCodebook]]), top-k
    * through the bounded-buffer [[graft.functions.TopK]] aggregate.
    * Per-query ADC tables ride as broadcast plan state; comparisons are
    * O(Σ probed-list sizes) table lookups. At full probe this provably
    * equals [[PqCodebook.search]] whatever the coarse centroids converged
    * to — which is what keeps the composition oracle-checkable by the same
    * ADC oracle.
    *
    * Pass [[pqCodes]] as `corpusCodes` for repeated searches: without it,
    * each call re-encodes the corpus inline (one scan-stage pass — fine
    * for a one-shot query batch, wasteful for a serving loop).
    */
  def searchPq(pq: PqCodebook, queries: DataFrame, k: Int, nProbe: Int,
               corpusCodes: Option[DataFrame] = None,
               saltBuckets: Int = 0): DataFrame = {
    val codesDf = corpusCodes.getOrElse(
      assigned.select(
        col(idCol).as("neighbor_id"),
        graft.functions.PqEncode(col(vecCol), pq.codebooks).as("codes"),
        col("list")))
    val (_, tables) = pq.adcQueryTables(queries, idCol, vecCol)
    val q = queries.select(
      col(idCol).as("query_id"),
      explode(probeLists(col(vecCol), nProbe)).as("list"))
    val scored = probeJoin(q, codesDf, saltBuckets)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        // TopK is max-first; ADC is a distance — negate so nearest ranks first
        (-graft.functions.AdcDist(col("query_id"), col("codes"), tables)).as("score"))
    graft.functions.TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        (-col("score")).as("adc_dist"))
  }

  /** Incremental maintenance for continuous ingest: assign a NEW batch
    * against the EXISTING centroids and union its inverted-list entries —
    * the FAISS `add` shape. No retraining, no reassignment of history
    * (assignment depends only on the centroids, so the result is exactly
    * what a fresh build with these centroids would assign); one codegen'd
    * pass over the batch. Re-train (a new [[IvfIndex.build]]) only when
    * drift degrades probe recall — searches are unaffected in the
    * full-probe limit either way.
    */
  def add(batch: DataFrame): IvfIndex = {
    val newAssigned = batch.select(
        col(idCol), col(vecCol),
        graft.functions.NearestCentroid(col(vecCol), centroids).as("list"))
      .localCheckpoint(true)
    copy(assigned = assigned.unionByName(newAssigned))
  }
}

object IvfIndex {

  /** Build the index: fit a seeded k-means coarse quantizer, assign every
    * corpus vector to its nearest centroid, persist the inverted lists.
    *
    * `trainFraction` samples the k-means training set: a COARSE quantizer
    * only needs centroids representative of the density, not of every
    * vector — FAISS trains IVF on ~1–10% of the corpus — so at scale the
    * training pass must not be a full corpus scan. Defaults to 1.0 (full)
    * so small-scale builds stay deterministic for the oracle gates; the
    * full-probe ≡ brute-force identity holds for ANY centroid set, sampled
    * or not (probing all lists scores every vector regardless of routing),
    * which is what keeps a sampled build oracle-checkable.
    */
  def build(corpus: DataFrame, nLists: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            seed: Long = 42L, maxIter: Int = 8,
            trainFraction: Double = 1.0): IvfIndex = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val sess = corpus.sparkSession
    import sess.implicits._
    def features(src: DataFrame): DataFrame = src.select(col(idCol), col(vecCol))
      .map { r =>
        (r.getLong(0), Vectors.dense(r.getSeq[Float](1).map(_.toDouble).toArray))
      }.toDF(idCol, "features")
    val train =
      if (trainFraction < 1.0) {
        // checkpoint the sample so the k-means iterations (and the count
        // below) read cached blocks, not the corpus
        val sampled = features(corpus.sample(withReplacement = false, trainFraction, seed))
          .localCheckpoint(true)
        // fewer sampled rows than centroids cannot seed k-means (KMeans
        // would throw or produce degenerate centroids) — tiny corpora fall
        // back to the full frame
        if (sampled.count() >= nLists) sampled else features(corpus)
      } else features(corpus)
    // a COARSE quantizer doesn't need converged centroids — every extra
    // k-means iteration is a pass over the (sampled) training set, and
    // probe-side recall is the knob that actually buys accuracy (nProbe),
    // so default iterations low
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    // eager localCheckpoint, not persist: the inverted lists are reused by
    // every search, but the blocks are ContextCleaner-owned — dropping the
    // index frees them on GC; a CacheManager persist would leak across
    // repeated builds (nobody downstream could unpersist it).
    // Assignment is the one build pass that touches EVERY corpus row, so it
    // runs as a native codegen'd expression (argmin over the centroid
    // matrix riding in the plan), not a ScalaUDF.
    val assigned = corpus.select(
        col(idCol), col(vecCol),
        graft.functions.NearestCentroid(col(vecCol), centroids).as("list"))
      .localCheckpoint(true)
    IvfIndex(assigned, centroids, idCol, vecCol)
  }
}
