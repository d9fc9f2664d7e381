package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width (positional) flat files — the enterprise interchange
  * format mainframe extracts, clearing-house feeds, and legacy ERP
  * dumps still arrive in: every field lives at a DECLARED (start,
  * width) byte range of each line, no delimiters, no escaping, no
  * quoting — which is exactly why the format survives (a COBOL
  * copybook IS this layout). The source-family member beside CSV/JSON
  * (those parse structure; this parses POSITION).
  *
  * Layout contract: 1-based `start`, fields must not overlap (raise at
  * build — an overlapping copybook is a transcription error), may
  * leave gaps (filler bytes are legitimately skipped). Read semantics:
  * `string` fields right-trim (the space-padding convention), `long`
  * fields trim both sides and parse sign+digits with empty→NULL and
  * garbage→NULL (data, not config — the [[graft.operators.CidrJoin]]
  * fact-side convention); short lines yield NULL for fields past the
  * end (truncated trailing filler is routine in real feeds); lines
  * LONGER than the layout are fine (trailing filler). Write semantics:
  * strings left-justify space-padded, longs right-justify space-padded,
  * with loud raises when a value cannot fit its width (silent
  * truncation would corrupt a positional file irrecoverably).
  *
  * Scale shape: pure scan-stage substring/trim/cast expressions over
  * `spark.read.text` lines — no shuffle, codegen'd, splittable files.
  */
object FixedWidth {

  /** One field of the layout: 1-based start, byte width, "string" or
    * "long".
    */
  final case class Field(name: String, start: Int, width: Int,
                         kind: String = "string") {
    require(start >= 1, s"field $name: start must be 1-based, got $start")
    require(width >= 1, s"field $name: width must be positive, got $width")
    require(kind == "string" || kind == "long",
      s"field $name: kind must be string|long, got $kind")
    def end: Int = start + width - 1
  }

  private def validate(layout: Seq[Field]): Unit = {
    require(layout.nonEmpty, "layout must carry at least one field")
    require(layout.map(_.name).distinct.length == layout.length,
      s"duplicate field names in ${layout.map(_.name)}")
    layout.sortBy(_.start).sliding(2).foreach {
      case Seq(a, b) => require(a.end < b.start,
        s"fields ${a.name} and ${b.name} overlap ([${a.start},${a.end}] " +
          s"vs [${b.start},${b.end}]) — a copybook never overlaps")
      case _ => ()
    }
  }

  /** Parse a line column into typed fields (appended). */
  def parseLines(lines: DataFrame, lineCol: String,
                 layout: Seq[Field]): DataFrame = {
    validate(layout)
    val cols = layout.map { f =>
      val raw = substring(col(lineCol), f.start, f.width)
      val c = f.kind match {
        case "string" => rtrim(raw)
        case "long" =>
          val t = trim(raw)
          when(t.rlike("^[+-]?[0-9]+$"), t.cast("long"))
      }
      // a field past a short line's end is NULL; NUMERIC fields need
      // FULL coverage — right-justified digits truncate into a smaller
      // valid number otherwise (r10 review fix), while a truncated
      // string field is legitimately the writer's right-trimmed tail
      val covered = f.kind match {
        case "long" => length(col(lineCol)) >= f.end
        case _ => length(col(lineCol)) >= f.start
      }
      when(covered, c).as(f.name)
    }
    lines.select(col(lineCol) +: cols: _*).drop(lineCol)
  }

  /** Read a fixed-width file directory written by [[write]] (or any
    * line-oriented positional file).
    */
  def read(spark: SparkSession, path: String,
           layout: Seq[Field]): DataFrame =
    parseLines(spark.read.text(path), "value", layout)

  /** Render rows into positional lines (gaps become spaces); raises on
    * any value wider than its field.
    */
  def renderLines(df: DataFrame, layout: Seq[Field]): DataFrame = {
    validate(layout)
    val total = layout.map(_.end).max
    val sorted = layout.sortBy(_.start)
    val pieces = sorted.zipWithIndex.flatMap { case (f, i) =>
      val gapFrom = if (i == 0) 1 else sorted(i - 1).end + 1
      val gap = if (f.start > gapFrom)
        Some(lit(" " * (f.start - gapFrom))) else None
      val s = coalesce(col(f.name).cast("string"), lit(""))
      val fits = length(s) <= f.width
      val padded = f.kind match {
        case "string" => rpad(s, f.width, " ")
        case "long" => lpad(s, f.width, " ")
      }
      val guarded = when(!fits, raise_error(concat(
        lit(s"fixedWidth: value '"), s,
        lit(s"' does not fit field ${f.name} (width ${f.width}) — " +
          "widen the layout; positional truncation is corruption"))))
        .otherwise(padded)
      gap.toSeq :+ guarded
    }
    df.select(concat(pieces: _*).as("value"))
      .withColumn("value", rpad(col("value"), total, " "))
  }

  /** Write rows as a fixed-width text file. */
  def write(df: DataFrame, path: String, layout: Seq[Field]): Unit =
    renderLines(df, layout).coalesce(1)
      .write.mode("overwrite").text(path)
}
