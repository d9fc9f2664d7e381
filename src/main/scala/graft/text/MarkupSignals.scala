package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-markup cleanliness signals — the extraction-quality screen run
  * after HTML-to-text conversion (RefinedWeb/C4 both filter on these): a
  * "text" document still carrying tags, entities, URLs, or code-ish
  * braces was mis-extracted (or is code), and those counts are the
  * filter's inputs. Per document: raw counts of HTML tags, character
  * entities, URLs, and brace/semicolon code symbols — pure scan-stage
  * codegen'd regex in the Java-regex ∩ RE2 portable subset (the [[Pii]]
  * discipline; no lookarounds, no backrefs), zero shuffle, zero state.
  *
  * These are SIGNALS, not a sanitizer: route high-count docs to
  * re-extraction or drop them; use [[Pii.redact]]-style rewriting only
  * for patterns whose removal is semantics-preserving.
  */
object MarkupSignals {

  /** `<tag ...>` / `</tag>` / `<tag/>` — word-initial tags only. */
  val TagPat = "</?[A-Za-z][A-Za-z0-9]*[^<>]*>"

  /** `&amp;` / `&#39;` / `&#x27;` character entities. */
  val EntityPat = "&[A-Za-z]+;|&#[0-9]+;|&#[xX][0-9A-Fa-f]+;"

  /** http(s) URLs (scheme-anchored — bare domains are too noisy). */
  val UrlPat = "https?://[^\\s]+"

  /** Code-ish symbols: braces and semicolons (C/JS/JSON debris). */
  val CodeCharPat = "[{};]"

  val Rules: Seq[(String, String)] = Seq(
    ("tags", TagPat), ("entities", EntityPat),
    ("urls", UrlPat), ("code_chars", CodeCharPat))

  /** (idCol, n_tags, n_entities, n_urls, n_code_chars, n_markup) per
    * document; NULL id/text rows drop. Rules are independent raw counts
    * and deliberately OVERLAP (an entity's terminating `;` also counts
    * as a code char) — these are thresholding signals, not a parse.
    */
  def counts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = Rules.map { case (name, pat) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast("long").as(s"n_$name")
    }
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select((col(idCol) +: cols): _*)
      .withColumn("n_markup", Rules.map(r => col(s"n_${r._1}")).reduce(_ + _))
  }

  /** DuckDB replay of [[counts]] over an arbitrary text expression. */
  def countsOracle(table: String, idCol: String, textSql: String): String = {
    val cols = Rules.map { case (name, pat) =>
      s"CAST(len(regexp_extract_all($textSql, '${pat.replace("'", "''")}')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    val total = Rules.map(r => s"n_${r._1}").mkString(" + ")
    s"""WITH c AS (SELECT $idCol,
  $cols
FROM $table WHERE $idCol IS NOT NULL AND ($textSql) IS NOT NULL)
SELECT $idCol, ${Rules.map(r => s"n_${r._1}").mkString(", ")},
  CAST($total AS BIGINT) AS n_markup
FROM c ORDER BY $idCol"""
  }
}
