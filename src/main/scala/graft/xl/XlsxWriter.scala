package graft.xl

import org.apache.spark.sql.DataFrame
import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal single-sheet XLSX writer (JDK zip only). The reference has no
  * Excel writer — this exists so the XLSX reader is testable offline and as
  * an extra sink. Strings are written inline (no shared-string table);
  * dates/times/datetimes get the builtin numFmt styles 14/21/22 so the
  * reader's style detection roundtrips.
  */
object XlsxWriter {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private val epoch1900 = java.time.LocalDate.of(1899, 12, 30)

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Byte    => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short   => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int     => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long    => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float   => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double  => s"""<c r="$ref"><v>$n</v></c>"""
    case d: java.math.BigDecimal => s"""<c r="$ref"><v>${d.toPlainString}</v></c>"""
    case d: java.time.LocalDate =>
      val serial = java.time.temporal.ChronoUnit.DAYS.between(epoch1900, d)
      s"""<c r="$ref" s="1"><v>$serial</v></c>"""
    case d: java.sql.Date => cellXml(ref, d.toLocalDate)
    case t: java.time.LocalTime =>
      val frac = t.toNanoOfDay / 86400.0 / 1e9
      s"""<c r="$ref" s="2"><v>$frac</v></c>"""
    case dt: java.time.LocalDateTime =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(epoch1900, dt.toLocalDate)
      val frac = dt.toLocalTime.toNanoOfDay / 86400.0 / 1e9
      s"""<c r="$ref" s="3"><v>${days + frac}</v></c>"""
    case ts: java.sql.Timestamp => cellXml(ref, ts.toLocalDateTime)
    case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
  }

  /** Write rows (with optional header names) as sheet "data". */
  def write(path: String, header: Option[Seq[String]], rows: Iterator[Seq[Any]]): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="1"><font/></fonts><fills count="1"><fill/></fills><borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf/></cellStyleXfs>
        |<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="21" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin)

    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    def w(s: String): Unit = zos.write(s.getBytes("UTF-8"))
    w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    var rowIdx = 1
    def writeRow(vals: Seq[Any]): Unit = {
      w(s"""<row r="$rowIdx">""")
      vals.zipWithIndex.foreach { case (v, i) => w(cellXml(s"${colRef(i)}$rowIdx", v)) }
      w("</row>")
      rowIdx += 1
    }
    header.foreach(writeRow)
    rows.foreach(writeRow)
    w("</sheetData></worksheet>")
    zos.closeEntry()
    zos.close()
  }

  /** Write a (small, driver-collected) DataFrame — XLSX is a single-file
    * driver-side format, like every spreadsheet library.
    */
  def writeDataFrame(path: String, df: DataFrame, header: Boolean = true): Unit = {
    val names = if (header) Some(df.columns.toSeq) else None
    write(path, names, df.toLocalIterator().asScala.map(_.toSeq))
  }

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
