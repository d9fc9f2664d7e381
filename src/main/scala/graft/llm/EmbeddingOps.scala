package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column storage/compression primitives: int8 quantization and
  * L2 normalization. At 100 TB the embedding store dominates ANN memory —
  * symmetric int8 quantization cuts it 4× (float32 → int8 per dim) at a
  * bounded precision cost (≤ m/254 per element, m = the vector's max |x|),
  * which is the standard trade every large-scale vector index
  * (FAISS-style) makes before anything fancier like PQ.
  *
  * Determinism contract: quantized codes are integers produced by a fixed
  * IEEE-double formula — `floor(x · 127/m + 1/2)` — so two engines (or two
  * cluster layouts) produce bit-identical codes; the DuckDB oracle replays
  * the formula exactly. No RNG, no codebook training.
  *
  * All combinators are pure Column HOFs (interpreted, not codegen'd — fine
  * off the hot loop; the pair-scoring hot path stays on
  * [[graft.functions.QuantizedDot]]).
  */
object EmbeddingOps {

  /** max |x| of the vector in double — the symmetric quantization range. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization: code_i = floor(x_i · 127/m + 1/2) ∈
    * [-127, 127]; the all-zero vector quantizes to all-zero codes. The
    * explicit floor(+1/2) (not round()) pins half-way behavior to one
    * engine-independent formula.
    *
    * The range `m` is bound ONCE per row through a single-element outer
    * transform: higher-order-function lambdas are interpreted with no
    * common-subexpression elimination, so referencing the maxAbs
    * EXPRESSION inside the per-element lambda would recompute the O(dim)
    * max for every element — O(dim²) per row; a lambda VARIABLE reference
    * is free.
    */
  def quantizeInt8(vec: Column): Column =
    element_at(
      transform(array(maxAbs(vec)), m =>
        when(m === 0.0, transform(vec, _ => lit(0)))
          .otherwise(transform(vec,
            x => floor(x.cast("double") * (lit(127.0) / m) + 0.5).cast("int")))),
      1)

  /** The quantization range as a fixed-point int (floor(m·10⁴)) — store it
    * beside the codes; integer so results hash identically across engines.
    */
  def rangeQ4(vec: Column): Column =
    floor(maxAbs(vec) * 1e4).cast("long")

  /** Reconstruction: x̂_i = code_i · m/127 (double). Max per-element error
    * is m/254 by construction.
    */
  def dequantize(codes: Column, m: Column): Column =
    transform(codes, c => c.cast("double") * (m.cast("double") / lit(127.0)))

  /** L2 normalization in double; zero vectors stay zero. The norm is bound
    * once per row (same single-element-transform binding as
    * [[quantizeInt8]] — an O(dim) expression must not re-evaluate per
    * element).
    */
  def l2Normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    element_at(
      transform(array(norm), n =>
        when(n === 0.0, transform(vec, x => x.cast("double")))
          .otherwise(transform(vec, x => x.cast("double") / n))),
      1)
  }

  /** Brute-force top-k over int8 CODES — search running where the compressed
    * store lives, the point of quantizing at all: the pair loop multiplies
    * 1-byte ints (exact Long dot, ≤127²·dim — engine-replayable), the
    * broadcast query side carries codes not floats (4× smaller), and top-k
    * per query uses the bounded-buffer [[graft.functions.TopK]] aggregator —
    * each map partition ships ≤k candidates per query instead of
    * window-sorting every scored pair. Note int8 ANN is approximate vs
    * float scoring (that is the storage trade); ranking within the
    * quantized space is exact and deterministic.
    */
  def int8Knn(
      corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), quantizeInt8(col(vecCol)).as("qc")))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantizeInt8(col(vecCol)).as("cc"))
    val dot = aggregate(
      zip_with(col("qc"), col("cc"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot.as("score"))
    graft.functions.TopK.perGroup(scored, Seq("query_id"), col("score"), col("neighbor_id"), k)
      .withColumnRenamed("id", "neighbor_id")
  }

  /** Per-row distance to the GROUP centroid in embedding space, exact —
    * the curation screen for "this document's embedding doesn't belong
    * to its declared stratum" (mislabeled language, off-topic source,
    * embedding-pipeline glitches): over the int8 codes, each row scores
    *
    *   dist2_scaled = ‖n·x − S‖²  (per group: n rows, S = Σ codes)
    *
    * which is n² times the distance to the true mean — the MEAN never
    * needs to be materialized (it isn't integral), and since n is
    * constant within a group the ranking/thresholding inside each group
    * is exactly distance-to-centroid. Published per row with n so a
    * caller can normalize; magnitudes ride DECIMAL(38,0)/HUGEINT
    * (n·x ≤ 127n; the squared sum ≤ dim·(254n)² — fits past 10¹⁶ rows
    * per group at dim 64).
    *
    * Scale shape: one scan-stage quantize + a per-(group, dim) partial-
    * agg'd sum (dim-bounded), the group sums broadcast back as an array,
    * then one codegen-friendly zip_with fold per row — row-sized output
    * because the QUESTION is row-sized. NULL groups are a real stratum;
    * NULL vectors drop.
    */
  def centroidDist2(df: DataFrame, idCol: String, groupCol: String,
                    vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val coded = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        quantizeInt8(col(vecCol)).as("__c"))
      .localCheckpoint(true)
    val sums = coded
      .select(col("grp"), posexplode(col("__c")).as(Seq("__dim", "__q")))
      .groupBy(col("grp").as("__g"), col("__dim"))
      .agg(sum(col("__q").cast("long")).as("__s"))
      .groupBy(col("__g"))
      .agg(array_sort(collect_list(struct(col("__dim"), col("__s"))))
        .as("__sv"))
      .select(col("__g"),
        transform(col("__sv"), s => s.getField("__s")).as("__sums"))
    val counts = coded.groupBy(col("grp").as("__g2"))
      .agg(count(lit(1)).as("__n"))
    coded
      .join(broadcast(sums), col("grp") <=> col("__g"))
      .join(broadcast(counts), col("grp") <=> col("__g2"))
      .select(col("id"), col("grp"), col("__n").as("n"),
        aggregate(
          zip_with(col("__c"), col("__sums"),
            (x, s) => {
              // cast BEFORE squaring: n·x ≤ 127n overflows long squared
              // at huge n; the duplicate-expression re-eval is cheap
              val d = (x.cast("long") * col("__n") - s).cast(dec)
              d * (x.cast("long") * col("__n") - s).cast(dec)
            }),
          lit(0).cast(dec), (acc, v) => acc + v)
          .cast("string").as("dist2_scaled"))
  }

  /** Cross-strata centroid-separation matrix — the companion readout to
    * [[centroidDist2]] (that scores a ROW against its own stratum; this
    * asks whether the STRATA are separated at all — near-zero
    * separation between two language labels means the labels don't
    * carve the embedding space and a classifier trained on them is
    * fitting noise): for every unordered group pair,
    *
    *   sep2_scaled = ‖n_b·S_a − n_a·S_b‖²  = (n_a·n_b)²·‖μ_a − μ_b‖²
    *
    * exact over the int8 sums — the means never materialize. Scaled by
    * (n_a·n_b)², so compare ACROSS pairs after normalizing; within a
    * fixed pair the number is exact. |groups|²-sized output from the
    * dim-bounded sums table alone — no corpus pass beyond the sums.
    */
  def centroidSeparation(df: DataFrame, groupCol: String,
                         vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val sums = df.where(col(vecCol).isNotNull)
      .select(col(groupCol).as("grp"),
        posexplode(quantizeInt8(col(vecCol))).as(Seq("__dim", "__q")))
      .groupBy(col("grp"), col("__dim"))
      .agg(sum(col("__q").cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("__dim"), col("__s"))))
        .as("__sv"), first(col("__n")).as("__n"))
      .select(col("grp"),
        transform(col("__sv"), s => s.getField("__s")).as("__sums"),
        col("__n"))
      .localCheckpoint(true)
    val a = sums.select(col("grp").as("grp_a"), col("__sums").as("__sa"),
      col("__n").as("n_a"))
    val b = sums.select(col("grp").as("grp_b"), col("__sums").as("__sb"),
      col("__n").as("n_b"))
    // NULL groups drop from the matrix on BOTH engines (NULL < x is
    // NULL): a separation from an unlabeled stratum is not meaningful
    a.join(b, col("grp_a").cast("string") < col("grp_b").cast("string"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        aggregate(
          zip_with(col("__sa"), col("__sb"),
            (sa, sb) => {
              val d = (col("n_b") * sa - col("n_a") * sb).cast(dec)
              d * (col("n_b") * sa - col("n_a") * sb).cast(dec)
            }),
          lit(0).cast(dec), (acc, v) => acc + v)
          .cast("string").as("sep2_scaled"))
  }

  /** DuckDB replay of [[centroidSeparation]]. */
  def centroidSeparationOracle(table: String, groupCol: String,
                               vecCol: String, dim: Int): String =
    s"""WITH t AS (SELECT $groupCol AS grp, $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m
  FROM $table WHERE $vecCol IS NOT NULL),
q8 AS (SELECT grp, ${quantSql("v", "m")} AS qc FROM t),
e AS (SELECT grp, unnest(qc) AS q, unnest(generate_series(1, $dim)) AS i FROM q8),
d AS (SELECT grp, i, CAST(sum(q) AS HUGEINT) AS su FROM e GROUP BY grp, i),
s AS (SELECT grp, list(su ORDER BY i) AS sums FROM d GROUP BY grp),
c AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n FROM q8 GROUP BY grp),
g AS (SELECT s.grp, s.sums, c.n FROM s JOIN c ON s.grp IS NOT DISTINCT FROM c.grp)
SELECT a.grp AS grp_a, b.grp AS grp_b,
  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
  CAST(list_sum(list_transform(generate_series(1, $dim),
    i -> (b.n * a.sums[i] - a.n * b.sums[i]) *
         (b.n * a.sums[i] - a.n * b.sums[i]))) AS VARCHAR) AS sep2_scaled
FROM g a JOIN g b
  ON CAST(a.grp AS VARCHAR) < CAST(b.grp AS VARCHAR)
ORDER BY grp_a, grp_b""".stripMargin

  /** DuckDB replay of [[centroidDist2]] — the scaled distance exceeds
    * 64 bits in general, so it projects as its canonical decimal string
    * (the grouped-correlation discipline).
    */
  def centroidDist2Oracle(table: String, idCol: String, groupCol: String,
                          vecCol: String, dim: Int): String =
    s"""WITH t AS (SELECT $idCol AS id, $groupCol AS grp, $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m
  FROM $table WHERE $vecCol IS NOT NULL),
q8 AS (SELECT id, grp, ${quantSql("v", "m")} AS qc FROM t),
e AS (SELECT grp, unnest(qc) AS q, unnest(generate_series(1, $dim)) AS i FROM q8),
d AS (SELECT grp, i, CAST(sum(q) AS HUGEINT) AS su FROM e GROUP BY grp, i),
s AS (SELECT grp, list(su ORDER BY i) AS sums FROM d GROUP BY grp),
c AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n FROM q8 GROUP BY grp)
SELECT q8.id, q8.grp, CAST(c.n AS BIGINT) AS n,
  CAST(list_sum(list_transform(generate_series(1, $dim),
    i -> (CAST(q8.qc[i] AS HUGEINT) * c.n - s.sums[i]) *
         (CAST(q8.qc[i] AS HUGEINT) * c.n - s.sums[i]))) AS VARCHAR)
    AS dist2_scaled
FROM q8 JOIN s ON q8.grp IS NOT DISTINCT FROM s.grp
JOIN c ON q8.grp IS NOT DISTINCT FROM c.grp
ORDER BY q8.id""".stripMargin

  /** Per-dimension centroid sums of two corpus slices over the int8
    * codes — embedding-space DRIFT measurement ("did this month's corpus
    * move semantically"): `(dim, sum_a, sum_b)` are EXACT integers (int8
    * codes sum exactly), and since cosine is scale-invariant,
    * cos(Σa, Σb) = cos(μa, μb) — derive the drift angle from the sums
    * with ONE double chain (dot / √·√, see [[centroidCosine]]) without
    * ever dividing inside the aggregate. The embedding-space sibling of
    * the token-level [[graft.text.VocabDrift]].
    *
    * Scale shape: per side, one scan-stage quantize + posexplode and a
    * partial-agg'd per-dimension sum (dim-bounded output); the join is
    * dims × dims.
    */
  def centroidSums(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    def sums(df: DataFrame, out: String) = df
      .where(col(vecCol).isNotNull)
      .select(posexplode(quantizeInt8(col(vecCol))).as(Seq("dim", "__q")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(sum(col("__q").cast("long")).as(out))
    sums(a, "sum_a").join(sums(b, "sum_b").withColumnRenamed("dim", "__d"),
        col("dim") === col("__d"), "full_outer")
      .select(coalesce(col("dim"), col("__d")).as("dim"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"))
  }

  /** cos(μa, μb) from a [[centroidSums]] frame — exact integer dot and
    * norms, one IEEE double chain at the end (NULL when a side is all
    * zero). Collects the dim-bounded frame; returns the scalar.
    */
  def centroidCosine(sums: DataFrame): Option[Double] = {
    val rows = sums.select("sum_a", "sum_b").collect()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    rows.foreach { r =>
      val x = r.getLong(0).toDouble; val y = r.getLong(1).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    if (na == 0.0 || nb == 0.0) None
    else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** DuckDB replay of [[centroidSums]] with sides given as subqueries. */
  def centroidSumsOracle(aSql: String, bSql: String, vecCol: String): String = {
    def side(src: String, out: String) =
      s"""SELECT dim, CAST(sum(c) AS BIGINT) AS $out
  FROM (SELECT unnest(range(len(qc))) AS dim, unnest(qc) AS c
    FROM (SELECT ${quantSql("v", "m")} AS qc
      FROM (SELECT $vecCol AS v,
        list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM ($src) WHERE $vecCol IS NOT NULL)))
  GROUP BY 1"""
    s"""WITH sa AS (${side(aSql, "sum_a")}),
sb AS (${side(bSql, "sum_b")})
SELECT CAST(coalesce(sa.dim, sb.dim) AS BIGINT) AS dim,
  coalesce(sa.sum_a, 0) AS sum_a, coalesce(sb.sum_b, 0) AS sum_b
FROM sa FULL OUTER JOIN sb ON sa.dim = sb.dim ORDER BY dim""".stripMargin
  }

  // ------------------------------------------------- DuckDB oracle SQL ----

  private[llm] def quantSql(v: String, m: String): String =
    s"CASE WHEN $m = 0 THEN list_transform($v, x -> 0) " +
      s"ELSE list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / $m) + 0.5) AS INTEGER)) END"

  /** Oracle for [[int8Knn]] with queries = a filtered subset of the table. */
  def int8KnnOracle(table: String, idCol: String, vecCol: String,
                    queryPred: String, k: Int, dim: Int): String =
    s"""WITH t AS (SELECT $idCol, $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m FROM $table),
q8 AS (SELECT $idCol, ${quantSql("v", "m")} AS qc FROM t),
s AS (SELECT a.$idCol AS query_id, b.$idCol AS neighbor_id,
  CAST(list_sum(list_transform(generate_series(1,$dim), i -> a.qc[i] * b.qc[i])) AS BIGINT) AS score
  FROM q8 a JOIN q8 b ON a.$idCol != b.$idCol WHERE a.$idCol IN (SELECT $idCol FROM $table WHERE $queryPred)),
r AS (SELECT query_id, neighbor_id, score, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, CAST(score AS DOUBLE) AS score
FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Oracle for [[quantizeInt8]] + [[rangeQ4]] over a list-of-float column,
    * exploded to one (id, pos, code) row per element: the comparison
    * harness canonicalizes scalar cells only (array cells are unhashable
    * on the pandas side), and the exploded shape is also the stronger
    * check — every code is verified cell-by-cell, not as an opaque list.
    */
  def quantizeOracle(table: String, idCol: String, vecCol: String): String =
    s"""WITH t AS (SELECT $idCol,
  $vecCol AS v,
  list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS m
FROM $table),
q AS (SELECT $idCol,
  CASE WHEN m = 0 THEN list_transform(v, x -> 0)
       ELSE list_transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / m) + 0.5) AS INTEGER)) END AS qvec,
  CAST(floor(m * 10000) AS BIGINT) AS m_q4
FROM t),
e AS (SELECT $idCol, m_q4, qvec, unnest(generate_series(1, len(qvec))) AS i FROM q)
SELECT $idCol, CAST(i - 1 AS BIGINT) AS pos, CAST(qvec[i] AS BIGINT) AS code, m_q4
FROM e ORDER BY $idCol, pos""".stripMargin
}
