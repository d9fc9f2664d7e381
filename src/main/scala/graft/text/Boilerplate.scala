package graft.text

import graft.functions.Md5Prefix60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain boilerplate line removal — the CCNet/RefinedWeb cleanup
  * step exact dedup can't do: navigation bars, cookie banners and
  * copyright footers repeat across MOST pages of a site while the pages
  * themselves are distinct, so page-level dedup keeps every copy. The
  * rule here: a line occurring in ≥ `minDocs` DISTINCT documents of the
  * same group (registrable domain / source / crawl) is boilerplate, and
  * EVERY copy is removed (unlike [[graft.llm.Dedup.dedupSpans]], which
  * keeps the first occurrence of a repeated span — boilerplate carries no
  * information worth one copy); documents are reassembled from surviving
  * lines in order, and every row survives (empty text when a document was
  * all boilerplate).
  *
  * Scale shape: line splitting is scan-stage array surgery; the frequency
  * rule is a partial-agg'd `count(DISTINCT doc)` per (group, 60-bit line
  * fingerprint) — Spark plans the distinct as a two-level aggregate over
  * (group, hash, doc) keys, so a line repeated 10⁶× inside one document
  * collapses map-side and a line repeated across 10⁶ documents ships one
  * row per (doc, partition); the rule frame is filtered to boilerplate
  * only (the frequent sliver) before the equi-join back (AQE broadcasts
  * it when small); reassembly is one groupBy(doc) whose buffer is the
  * document's own lines. Fingerprints (8 bytes) shuffle — line text never
  * does, except doc→lines→doc itself.
  */
object Boilerplate {

  /** (idCol, textCol) with per-`groupCol` frequent lines removed.
    * `sep` delimits lines (default newline); the split → rejoin round
    * trip normalizes consecutive separators (an empty line is a line).
    */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
                          groupCol: String, minDocs: Long,
                          sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would remove every line, got $minDocs")
    val ex = df
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), col(groupCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .withColumn("__lh", Md5Prefix60(col("line")))
    val rules = ex.groupBy(col(groupCol), col("__lh").as("__rh"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select(col(groupCol).as("__rg"), col("__rh"))
    val kept = ex.join(rules,
        col(groupCol) === col("__rg") && col("__lh") === col("__rh"), "left")
      .where(col("__rh").isNull)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as(textCol))
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), col(groupCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col(groupCol),
        coalesce(col(textCol), lit("")).as(textCol))
  }

  /** The audit frame: (groupCol, line, n_docs) for every boilerplate line
    * the removal would strip — review before you clean.
    */
  def frequentLines(df: DataFrame, idCol: String, textCol: String,
                    groupCol: String, minDocs: Long,
                    sep: String = "\n"): DataFrame =
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"),
        col(idCol))
      .groupBy(col(groupCol), col("line"))
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** DuckDB replay of [[removeFrequentLines]] over an arbitrary text
    * expression (parallel equal-length unnests zip positions with lines;
    * the rule groups on the line TEXT where Spark groups on its 60-bit
    * fingerprint — identical up to fingerprint collisions, the documented
    * dedup-family posture); same distinct-doc rule, same
    * left-join-back empty-text contract.
    */
  def removeOracle(table: String, idCol: String, groupCol: String,
                   textSql: String, minDocs: Long, sepSql: String,
                   textAlias: String): String =
    s"""WITH d AS (SELECT $idCol, $groupCol, $textSql AS t FROM $table
  WHERE $idCol IS NOT NULL AND ($textSql) IS NOT NULL),
ls AS (SELECT $idCol, $groupCol, string_split(t, $sepSql) AS l FROM d),
e AS (SELECT $idCol, $groupCol, unnest(l) AS line,
    unnest(range(len(l))) AS pos FROM ls),
r AS (SELECT $groupCol AS g, line FROM e
  GROUP BY 1, 2 HAVING count(DISTINCT $idCol) >= $minDocs),
k AS (SELECT e.$idCol,
    string_agg(e.line, $sepSql ORDER BY e.pos) AS t
  FROM e LEFT JOIN r ON e.$groupCol = r.g AND e.line = r.line
  WHERE r.line IS NULL GROUP BY 1)
SELECT d.$idCol, d.$groupCol, coalesce(k.t, '') AS $textAlias
FROM d LEFT JOIN k ON d.$idCol = k.$idCol ORDER BY d.$idCol""".stripMargin

  /** DuckDB replay of [[frequentLines]]. */
  def frequentOracle(table: String, idCol: String, groupCol: String,
                     textSql: String, minDocs: Long, sepSql: String): String =
    s"""WITH e AS (SELECT $idCol, $groupCol,
    unnest(string_split($textSql, $sepSql)) AS line
  FROM $table WHERE $idCol IS NOT NULL AND ($textSql) IS NOT NULL)
SELECT $groupCol, line, CAST(count(DISTINCT $idCol) AS BIGINT) AS n_docs
FROM e GROUP BY 1, 2 HAVING count(DISTINCT $idCol) >= $minDocs
ORDER BY 1, 2""".stripMargin
}
