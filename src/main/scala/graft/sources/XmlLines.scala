package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Newline-delimited flat XML records — the log-export cousin of
  * NDJSON that B2B integrations and audit trails still emit: one
  * `<row>...</row>` element per LINE, flat child elements, no nesting
  * (the DECLARED contract that makes scan-stage parsing honest — for
  * real nested XML use a real parser; this is for the
  * million-lines-a-minute export where each record IS a line, the
  * same positional honesty as [[FixedWidth]]).
  *
  * Read semantics: per declared field, `<f>text</f>` extracts with
  * the five XML 1.0 predefined entities unescaped (amp/lt/gt/quot/
  * apos — amp LAST on read so `&amp;lt;` round-trips as the literal
  * `&lt;`); an ABSENT tag and the self-closing `<f/>` are NULL, a
  * present-but-empty `<f></f>` is the empty string (absence ≠
  * emptiness — the distinction NDJSON keeps and CSV loses); lines not
  * carrying the row tag are skipped (headers, XML declarations).
  * Write semantics: NULL fields OMIT their tag, empty strings write
  * `<f></f>`, text escapes amp FIRST then lt/gt/quot/apos — the exact
  * inverse, round-trip spec-pinned on hostile strings.
  *
  * Scale shape: pure scan-stage regexp/replace expressions over
  * splittable line files — no shuffle, codegen'd, the FixedWidth
  * posture.
  */
object XmlLines {

  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'")

  private def unescape(c: Column): Column = {
    val base = Entities.foldLeft(c) { case (acc, (e, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), ch) }
    regexp_replace(base, java.util.regex.Pattern.quote("&amp;"), "&")
  }

  private def escape(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    Seq("<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;", "'" -> "&apos;")
      .foldLeft(amp) { case (acc, (ch, e)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(ch), e) }
  }

  /** Parse a line column into string fields (the caller casts). */
  def parseLines(lines: DataFrame, lineCol: String, rowTag: String,
                 fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must not be empty")
    require((rowTag +: fields).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"tags must be simple XML names, got ${rowTag +: fields}")
    val inRow = regexp_extract(col(lineCol),
      s"<$rowTag>(.*)</$rowTag>", 1)
    val cols = fields.map { f =>
      val present = inRow.rlike(s"<$f>.*</$f>|<$f/>")
      val selfClosed = inRow.rlike(s"<$f/>")
      val raw = regexp_extract(inRow, s"<$f>(.*?)</$f>", 1)
      when(present && !selfClosed, unescape(raw)).as(f)
    }
    lines
      .where(col(lineCol).rlike(s"<$rowTag>.*</$rowTag>"))
      .select(cols: _*)
  }

  def read(spark: SparkSession, path: String, rowTag: String,
           fields: Seq[String]): DataFrame =
    parseLines(spark.read.text(path), "value", rowTag, fields)

  /** Render rows as one XML element per line (all fields stringified;
    * NULLs omit their tag).
    */
  def renderLines(df: DataFrame, rowTag: String,
                  fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must not be empty")
    val pieces = fields.map { f =>
      when(col(f).isNotNull,
        concat(lit(s"<$f>"), escape(col(f).cast("string")), lit(s"</$f>")))
        .otherwise(lit(""))
    }
    df.select(concat(lit(s"<$rowTag>") +: pieces :+ lit(s"</$rowTag>"): _*)
      .as("value"))
  }

  def write(df: DataFrame, path: String, rowTag: String,
            fields: Seq[String]): Unit =
    renderLines(df, rowTag, fields).coalesce(1)
      .write.mode("overwrite").text(path)
}
