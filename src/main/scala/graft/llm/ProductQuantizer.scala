package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Product quantization (PQ) — the deep end of the vector-compression
  * ladder (float32 → int8 ([[EmbeddingOps]]) → PQ): split each vector into
  * `m` subvectors, k-means each subspace independently into `ksub`
  * centroids, and store only the m centroid ids — m bytes per vector when
  * ksub ≤ 256, a 32× cut at dim=64/m=8 vs float32. Queries score compressed
  * codes by ADC (asymmetric distance computation): per query, a tiny
  * m × ksub table of exact subspace distances is precomputed, and each
  * corpus vector's approximate distance is m table lookups — no
  * decompression, no float vector ever read at search time.
  *
  * Scale shape: codebooks are m·ksub·subDim doubles (KBs) — broadcast;
  * encoding is one pass over the corpus; ADC tables are per-query KBs —
  * broadcast; search never shuffles the corpus (codes scored in the scan
  * stage, top-k via the bounded-buffer [[graft.functions.TopK]] partial
  * aggregate).
  *
  * Training is seeded-deterministic but float-iterative, so the k-means
  * FIT is spec-verified (recall on separable data, code determinism). The
  * encode/ADC/search machinery itself IS oracle-gated: a codebook is just
  * data to those paths, so the gate injects a closed-form grid codebook
  * ([[ProductQuantizer.gridCodebook]]) and the DuckDB oracle replays
  * encode + ADC + top-k arithmetic exactly ([[ProductQuantizer.adcOracle]]).
  */
final case class PqCodebook(
    codebooks: Array[Array[Array[Double]]], // m × ksub × subDim
    m: Int, subDim: Int) {

  def ksub: Int = codebooks(0).length

  private def sqDist(v: Seq[Float], s: Int, c: Array[Double]): Double = {
    var d = 0.0; var j = 0
    while (j < c.length) { val t = v(s * c.length + j) - c(j); d += t * t; j += 1 }
    d
  }

  /** Encode vectors to m centroid ids: (`idCol`, codes array<int>).
    * Encoding IS the compression pass — it touches every corpus row — so
    * it runs as the native codegen'd [[graft.functions.PqEncode]]
    * expression (codebook as a plan reference object), not a ScalaUDF.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), graft.functions.PqEncode(col(vecCol), codebooks).as("codes"))

  /** Driver-side ADC prep shared by [[search]] and
    * [[IvfIndex.searchPq]]: the guarded query collect plus each query's
    * m × ksub exact subspace-distance table (the per-query broadcast
    * state `AdcDist` rides on).
    *
    * The query set materializes on the driver (the ADC tables are per-query
    * broadcast state), so it is bounded by
    * [[ProductQuantizer.MaxQueryRowsKey]] — an oversized query frame fails
    * fast instead of OOMing the driver, the same fail-fast contract as
    * `spark.graft.positional.maxRows`. The check rides the collect itself
    * (fetch limit+1 rows, raise past the limit): no second job, and never
    * materializes more than limit+1 rows.
    */
  private[llm] def adcQueryTables(queries: DataFrame, idCol: String, vecCol: String)
      : (Seq[Long], Map[Long, Array[Array[Double]]]) = {
    val limit = queries.sparkSession.conf.get(ProductQuantizer.MaxQueryRowsKey,
      ProductQuantizer.DefaultMaxQueryRows.toString).toLong
    val projected = queries.select(col(idCol), col(vecCol))
    val rows =
      if (limit > 0) {
        // clamp BEFORE the +1: limit = Long.MaxValue ("disable it the
        // obvious way") must not overflow into limit(0) and silently
        // return an empty search
        val r = projected.limit((math.min(limit, Int.MaxValue - 1L) + 1L).toInt).collect()
        if (r.length > limit) throw new IllegalStateException(
          s"PQ ADC search materializes the query set on the driver (per-query " +
            s"distance tables are broadcast state) and the query frame has more than " +
            s"${ProductQuantizer.MaxQueryRowsKey}=$limit rows. Queries are the small " +
            "side by contract; raise the conf to override.")
        r
      } else projected.collect()
    val qs = rows.map(r => (r.getLong(0), r.getSeq[Float](1)))
    val tables: Map[Long, Array[Array[Double]]] = qs.map { case (qid, v) =>
      qid -> Array.tabulate(m)(s => Array.tabulate(ksub)(c => sqDist(v, s, codebooks(s)(c))))
    }.toMap
    (qs.map(_._1).toSeq, tables)
  }

  /** ADC top-k: exact queries against the compressed corpus. `queries` must
    * be small (the per-query distance tables broadcast, guarded by
    * [[adcQueryTables]]); corpus `codes` stream through the scan stage and
    * ship ≤k candidates per query.
    */
  def search(codes: DataFrame, queries: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sess = codes.sparkSession
    val (ids, tables) = adcQueryTables(queries, idCol, vecCol)
    import sess.implicits._
    val qIds = ids.toDF("query_id")
    // pair-scoring hot loop: native codegen'd table lookups (AdcDist), the
    // per-query tables riding as a plan reference object
    val scored = codes.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(qIds))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        // TopK is max-first; ADC is a distance — negate so nearest ranks first
        (-graft.functions.AdcDist(col("query_id"), col("codes"), tables)).as("score"))
    graft.functions.TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        (-col("score")).as("adc_dist"))
  }
}

object ProductQuantizer {

  /** Conf key bounding the driver-materialized ADC query set
    * ([[PqCodebook.search]]); <= 0 disables. Same fail-fast pattern as
    * `spark.graft.positional.maxRows` (graft.core.Fabrix): APIs that
    * materialize a frame driver-side by design must refuse cluster-sized
    * input instead of OOMing.
    */
  val MaxQueryRowsKey = "spark.graft.ann.maxQueryRows"

  /** Default ceiling: at m=8/ksub=256 each query's ADC table is ~16 KB, so
    * 4096 queries broadcast ~64 MB — generous for a re-ranking or eval
    * batch, far below a corpus-sized frame.
    */
  val DefaultMaxQueryRows: Long = 4096L

  /** Train per-subspace codebooks with seeded k-means (seed offset by
    * subspace index so subspaces train independently but reproducibly).
    *
    * `trainFraction` samples the training set ONCE: a PQ codebook, like an
    * IVF coarse quantizer ([[IvfIndex.build]]), needs centroids
    * representative of the density, not of every vector — FAISS trains on
    * ~1–10% of the corpus — so at scale the fit must not scan the full
    * corpus, let alone once per subspace. Exactly ONE pass over the
    * (sampled) corpus splits every vector into its m subvectors into a
    * cached long frame; the m seeded k-means fits then iterate over that
    * cache and never touch the corpus again. Defaults to 1.0 (full) so
    * small-scale fits stay deterministic; a sample smaller than `ksub`
    * cannot seed k centroids, so tiny corpora fall back to the full frame.
    */
  def fit(corpus: DataFrame, m: Int, ksub: Int,
          idCol: String = "vec_id", vecCol: String = "embedding",
          seed: Long = 42L, maxIter: Int = 8,
          trainFraction: Double = 1.0): PqCodebook = {
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val sess = corpus.sparkSession
    import sess.implicits._
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    // eager localCheckpoint, not persist, for the same lifecycle reason as
    // IvfIndex.build: blocks are ContextCleaner-owned, freed when the frame
    // is collected — a CacheManager persist would leak across repeated fits
    def subvectors(src: DataFrame): DataFrame = src.flatMap { r =>
      val v = r.getSeq[Float](0)
      Iterator.tabulate(m)(s =>
        (s, Vectors.dense(Array.tabulate(subDim)(j => v(s * subDim + j).toDouble))))
    }.toDF("s", "features").localCheckpoint(true)
    val vecs = corpus.select(col(vecCol))
    val sub = {
      if (trainFraction < 1.0) {
        val sampled = subvectors(vecs.sample(withReplacement = false, trainFraction, seed))
        // count reads the checkpoint, not the corpus; / m gives source rows
        if (sampled.count() / m >= ksub) sampled else subvectors(vecs)
      } else subvectors(vecs)
    }
    val codebooks = Array.tabulate(m) { s =>
      val model = new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(maxIter)
        .setFeaturesCol("features").fit(sub.where(col("s") === s))
      model.clusterCenters.map(_.toArray)
    }
    PqCodebook(codebooks, m, subDim)
  }

  /** Closed-form codebook for oracle gating: centroid c of every subspace
    * is the constant vector `lo + (hi-lo)·c/(ksub-1)` — a scalar
    * quantization grid over the subvector. Encode/ADC treat a codebook as
    * opaque data, so running the REAL operator over a formulaic codebook
    * exercises exactly the code a trained codebook would, while the oracle
    * can re-derive every centroid from the formula (no float-iterative
    * k-means to replay).
    */
  def gridCodebook(m: Int, subDim: Int, ksub: Int, lo: Double, hi: Double): PqCodebook = {
    require(ksub >= 2, s"grid codebook needs ksub >= 2, got $ksub")
    val cbs = Array.tabulate(m)(_ => Array.tabulate(ksub)(c =>
      Array.fill(subDim)(lo + (hi - lo) * c / (ksub - 1))))
    PqCodebook(cbs, m, subDim)
  }

  /** DuckDB oracle for encode + ADC search over a [[gridCodebook]]: unrolls
    * every subspace-distance sum term-by-term in the same left-associative
    * order as the Scala loops, so each double is bit-identical across
    * engines (IEEE arithmetic is deterministic once the expression tree is
    * fixed; centroid literals are shortest-round-trip doubles). Argmin is
    * `list_position(l, list_min(l)) - 1` — first occurrence of the min,
    * matching the strict-< loop's tiebreak.
    */
  def adcOracle(table: String, idCol: String, vecCol: String, queryPred: String,
                k: Int, m: Int, subDim: Int, ksub: Int, lo: Double, hi: Double): String = {
    def g(c: Int): String = (lo + (hi - lo) * c / (ksub - 1)).toString
    def dist(vc: String, s: Int, c: Int): String =
      (0 until subDim).map { j =>
        val idx = s * subDim + j + 1
        s"(CAST($vc[$idx] AS DOUBLE) - ${g(c)}) * (CAST($vc[$idx] AS DOUBLE) - ${g(c)})"
      }.mkString("(", " + ", ")")
    def dlist(vc: String, s: Int): String =
      (0 until ksub).map(c => dist(vc, s, c)).mkString("[", ", ", "]")
    val encDists = (0 until m).map(s => s"${dlist("v", s)} AS d$s").mkString(",\n  ")
    val codes = (0 until m)
      .map(s => s"CAST(list_position(d$s, list_min(d$s)) - 1 AS INTEGER)")
      .mkString("[", ", ", "]")
    val qDists = (0 until m).map(s => s"${dlist("v", s)} AS q$s").mkString(",\n  ")
    val adcSum = (0 until m).map(s => s"q.q$s[e.codes[${s + 1}] + 1]").mkString(" + ")
    // length guard mirrors PqEncode's NULL-on-dimension-mismatch: rows whose
    // vector doesn't match m × subDim drop out on BOTH sides
    s"""WITH t AS (SELECT $idCol, $vecCol AS v FROM $table WHERE len($vecCol) = ${m * subDim}),
ed AS (SELECT $idCol,
  $encDists
FROM t),
enc AS (SELECT $idCol, $codes AS codes FROM ed),
qd AS (SELECT $idCol AS query_id,
  $qDists
FROM t WHERE $queryPred),
s AS (SELECT q.query_id, e.$idCol AS neighbor_id, $adcSum AS adc_dist
  FROM qd q JOIN enc e ON e.$idCol != q.query_id),
r AS (SELECT query_id, neighbor_id, adc_dist,
  row_number() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
