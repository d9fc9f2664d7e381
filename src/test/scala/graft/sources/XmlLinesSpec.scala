package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** XML lines: golden parses, absence vs emptiness vs self-closing,
  * entity round-trips on hostile strings, non-record line skipping,
  * tag-name contracts, file round-trip.
  */
class XmlLinesSpec extends SparkSpec {

  import spark.implicits._

  private def parse(lines: String*) =
    XmlLines.parseLines(lines.toDF("value"), "value", "row",
      Seq("id", "name"))

  test("golden parse with entities unescaped") {
    val r = parse("<row><id>7</id><name>A &amp; B &lt;Co&gt;</name></row>")
      .head()
    assert(r.getString(0) == "7" && r.getString(1) == "A & B <Co>")
  }

  test("absence is NULL, self-closing is NULL, empty tag is empty string") {
    val r = parse("<row><id>1</id></row>",
      "<row><id>2</id><name/></row>",
      "<row><id>3</id><name></name></row>").collect()
    assert(r(0).isNullAt(1) && r(1).isNullAt(1))
    assert(r(2).getString(1) == "")
  }

  test("XML declarations and stray lines skip silently") {
    val r = parse("<?xml version=\"1.0\"?>", "<!-- comment -->",
      "<row><id>5</id><name>x</name></row>").collect()
    assert(r.length == 1 && r(0).getString(0) == "5")
  }

  test("write/read round-trips hostile strings exactly") {
    val df = Seq((1L, Some("a&b<c>\"d'&amp;")), (2L, None),
      (3L, Some(""))).toDF("id", "name")
    val lines = XmlLines.renderLines(df, "row", Seq("id", "name"))
      .collect().map(_.getString(0))
    assert(lines(1) == "<row><id>2</id></row>") // NULL omits
    val back = XmlLines.parseLines(lines.toSeq.toDF("value"), "value",
        "row", Seq("id", "name"))
      .orderBy("id").collect()
    assert(back(0).getString(1) == "a&b<c>\"d'&amp;")
    assert(back(1).isNullAt(1))
    assert(back(2).getString(1) == "")
  }

  test("tag names must be simple XML names") {
    intercept[IllegalArgumentException] {
      XmlLines.parseLines(Seq("x").toDF("value"), "value", "row",
        Seq("bad-name!"))
    }
  }

  test("file round-trip through spark.read.text") {
    val dir = "/tmp/graft_xml_lines_spec"
    val df = Seq(("1", "alpha"), ("2", "beta & gamma")).toDF("id", "name")
    XmlLines.write(df, dir, "rec", Seq("id", "name"))
    val back = XmlLines.read(spark, dir, "rec", Seq("id", "name"))
      .orderBy("id").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "alpha"), ("2", "beta & gamma")))
  }
}
