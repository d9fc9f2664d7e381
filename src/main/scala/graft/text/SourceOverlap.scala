package graft.text

import graft.functions.Md5Prefix60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-overlap matrix — how much do two SOURCES (crawls, dumps,
  * vendors) share, before you pay to dedup or buy them twice: for every
  * source pair, the exact shingle-set sizes, intersection and quantized
  * Jaccard. The corpus-level complement of the per-document dedup
  * family: L2 asks "which documents match", this asks "which FEEDS
  * overlap" — the answer that decides acquisition and mixing policy.
  *
  * Scale shape: one partial-agg'd distinct over (source, 60-bit shingle
  * fingerprint) — a shingle repeated 10⁹× in one source collapses
  * map-side; the intersection is an 8-byte-keyed equi-join of that
  * distinct frame with itself restricted to src_a < src_b (never
  * documents × documents — volume is Σ per-fingerprint source-pair
  * collisions, and a fingerprint present in all S sources contributes
  * S²/2 pair rows, bounded by the SOURCE count, not the corpus); sizes
  * and the final matrix are |sources|-sized frames (the tiny `<`
  * cross-pairing rides a broadcast, the documented arms-sized-crossJoin
  * posture). At sketch scale — thousands of sources, or when exactness
  * can yield — use the [[graft.functions.BottomK]] KMV set algebra (L92)
  * per source instead: fixed k-length summaries, same Jaccard question.
  */
object SourceOverlap {

  val Scale = 1000000L

  /** (src_a, src_b, n_a, n_b, n_common, jaccard_scaled) for every
    * unordered source pair (src_a < src_b lexicographically), including
    * zero-overlap pairs; `jaccard_scaled` = ⌊SCALE·|∩|/|∪|⌋ exactly.
    */
  def overlapMatrix(df: DataFrame, srcCol: String, textCol: String,
                    shingleN: Int = 3): DataFrame = {
    // project to the two needed columns, then fan a single-split scan out
    // to parallelism (no-op at scale): the shingle explode + md5 otherwise
    // serializes into the lone scan task of the bench fixture layout
    val sh = graft.Guards.fanOut(df
        .where(col(srcCol).isNotNull && col(textCol).isNotNull)
        .select(col(srcCol), col(textCol)))
      .select(col(srcCol).as("__src"),
        explode(TextFunctions.shingleSet(col(textCol), shingleN)).as("__s"))
      .select(col("__src"), Md5Prefix60(col("__s")).as("__h"))
      .distinct()
    val sizes = sh.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val inter = sh.select(col("__src").as("__sa"), col("__h").as("__ha"))
      .join(sh.select(col("__src").as("__sb"), col("__h").as("__hb")),
        col("__ha") === col("__hb") && col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("__common"))
    val pairs = sizes.select(col("__src").as("src_a"), col("__n").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("__src").as("src_b"), col("__n").as("n_b"))))
      .where(col("src_a") < col("src_b"))
    pairs
      .join(inter, col("src_a") === col("__sa") && col("src_b") === col("__sb"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("__common"), lit(0L)).as("n_common"))
      .withColumn("jaccard_scaled",
        expr(s"(n_common * $Scale) div (n_a + n_b - n_common)"))
  }

  /** DuckDB replay of [[overlapMatrix]] — same shingle definition as the
    * dedup-family oracles (incl. the short-text fallback), distinct on
    * the same 60-bit fingerprint, same floor division (non-negative
    * operands).
    */
  def overlapOracle(table: String, srcCol: String, textCol: String,
                    shingleN: Int = 3): String = {
    val n = shingleN
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    s"""WITH toks AS (SELECT $srcCol AS src, string_split($textCol, ' ') AS t
  FROM $table WHERE $srcCol IS NOT NULL AND $textCol IS NOT NULL),
shl AS (SELECT src, unnest(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END) AS s
  FROM toks),
sh AS (SELECT DISTINCT src, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) AS h FROM shl),
sz AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
it AS (SELECT a.src AS sa, b.src AS sb, CAST(count(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.h = b.h AND a.src < b.src GROUP BY 1, 2)
SELECT x.src AS src_a, y.src AS src_b, x.n AS n_a, y.n AS n_b,
  coalesce(it.c, 0) AS n_common,
  CAST((coalesce(it.c, 0) * $Scale) // (x.n + y.n - coalesce(it.c, 0)) AS BIGINT)
    AS jaccard_scaled
FROM sz x JOIN sz y ON x.src < y.src
LEFT JOIN it ON it.sa = x.src AND it.sb = y.src
ORDER BY src_a, src_b""".stripMargin
  }
}
