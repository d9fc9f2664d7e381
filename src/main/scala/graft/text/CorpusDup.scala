package graft.text

import graft.functions.Md5Prefix60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document corpus-duplicated text share — the measurement BETWEEN
  * [[Repetition]] (repeats WITHIN a page) and the dedup family (which
  * PAIRS match): for each document, what fraction of its distinct
  * n-gram shingles appears in other documents too. The corpus-level
  * duplication profile that decides how aggressive dedup needs to be
  * (a corpus whose median doc is 40% duplicated shingles needs fuzzy
  * dedup; 2% needs exact only) and flags boilerplate-heavy docs that
  * pair-level dedup never catches (each PAIR is below threshold, but
  * the doc is assembled from corpus-common fragments).
  *
  * Exact integers throughout: distinct (doc, 60-bit shingle
  * fingerprint) pairs, per-fingerprint document frequency, per-doc
  * share ⌊10⁶·n_dup/n_shingles⌋ (non-negative — one floor division).
  *
  * Scale shape: the (doc, fp) explode is corpus-shingles-sized but
  * collapses distinct map-side; the df count is one partial-agg'd
  * shuffle on 8-byte fingerprints (a shingle in 10⁹ docs is one hot
  * counter absorbed map-side); the join back is fp-keyed with the df
  * side UNIQUE per fp — output volume is exactly the (doc, fp) pair
  * count, so a corpus-common shingle is a hot hash bucket (AQE-split),
  * never a volume blowup. NULL id/text rows drop.
  */
object CorpusDup {

  val Scale = 1000000L

  /** (idCol, n_shingles, n_dup, dup_share_q6) — n_dup counts the doc's
    * distinct shingles whose corpus document frequency is ≥ minDf.
    */
  def duplicatedShare(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (a doc always contains " +
      s"its own shingles), got $minDf")
    val pairs = df
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(TextFunctions.shingleSet(col(textCol), shingleN)).as("__s"))
      .select(col("__id"), Md5Prefix60(col("__s")).as("__h"))
      .distinct()
    val dfreq = pairs.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    pairs.join(dfreq, Seq("__h"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDf, lit(1L)).otherwise(lit(0L)))
          .as("n_dup"))
      .select(col("__id").as(idCol), col("n_shingles"), col("n_dup"),
        expr(s"(n_dup * $Scale) div n_shingles").as("dup_share_q6"))
  }

  /** DuckDB replay of [[duplicatedShare]] — the dedup-family shingle
    * definition (incl. the short-text fallback), same distinct
    * fingerprint pairs, same floor division.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
                shingleN: Int = 3, minDf: Int = 2): String = {
    val n = shingleN
    val shingleExpr = (0 until n).map(j => s"t[i+$j]").mkString("||' '||")
    s"""WITH toks AS (SELECT $idCol AS id, string_split($textCol, ' ') AS t
  FROM $table WHERE $idCol IS NOT NULL AND $textCol IS NOT NULL),
shl AS (SELECT id, unnest(CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
  ELSE list_transform(generate_series(1, len(t)-${n - 1}), i -> $shingleExpr) END) AS s
  FROM toks),
sh AS (SELECT DISTINCT id, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) AS h FROM shl),
dfq AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shingles,
    CAST(count(*) FILTER (WHERE df >= $minDf) AS BIGINT) AS n_dup
  FROM sh JOIN dfq USING (h) GROUP BY id)
SELECT id AS $idCol, n_shingles, n_dup,
  CAST((n_dup * $Scale) // n_shingles AS BIGINT) AS dup_share_q6
FROM agg ORDER BY $idCol"""
  }
}
