package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed width: golden parse lines, trim/NULL conventions, short and
  * long lines, gaps, the write round-trip, overflow and overlap
  * raises.
  */
class FixedWidthSpec extends SparkSpec {

  import spark.implicits._
  import FixedWidth.Field

  private val layout = Seq(
    Field("id", 1, 5, "long"),
    Field("name", 6, 10, "string"),
    Field("amount", 19, 8, "long")) // gap at 16..18

  private def parse(lines: String*) =
    FixedWidth.parseLines(lines.toDF("value"), "value", layout)

  test("golden lines parse with trim conventions and filler gaps") {
    val r = parse("  123ACME      xxx   -4500", "    7Widgets Co###     900").collect()
    assert(r(0).getLong(0) == 123L && r(0).getString(1) == "ACME")
    assert(r(0).getLong(2) == -4500L)
    assert(r(1).getLong(0) == 7L && r(1).getString(1) == "Widgets Co")
    assert(r(1).getLong(2) == 900L)
  }

  test("short lines NULL the fields past the end; long lines are fine") {
    val r = parse("  123ACME", "  123ACME      xxx    9900TRAILING-FILLER")
      .collect()
    assert(r(0).getLong(0) == 123L && r(0).getString(1) == "ACME")
    assert(r(0).isNullAt(2))
    assert(r(1).getLong(2) == 9900L)
  }

  test("garbage and empty numerics are NULL data, never a crash") {
    val r = parse("  abcACME      xxx  12,345.0").collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(2))
  }

  test("write/read round-trip preserves values; gaps render as spaces") {
    val df = Seq((42L, "Acme", 1234L), (7L, "Widget", -99L))
      .toDF("id", "name", "amount")
    val lines = FixedWidth.renderLines(df, layout)
      .collect().map(_.getString(0))
    assert(lines.forall(_.length == 26))
    assert(lines.head == "   42Acme         " + "    1234")
    val back = FixedWidth.parseLines(
      lines.toSeq.toDF("value"), "value", layout)
      .orderBy(desc("id")).collect()
    assert(back(0).getLong(0) == 42L && back(0).getString(1) == "Acme")
    assert(back(1).getLong(2) == -99L)
  }

  test("a value wider than its field raises; overlapping layouts reject") {
    val e = intercept[Exception] {
      FixedWidth.renderLines(
        Seq((123456L, "x", 0L)).toDF("id", "name", "amount"), layout)
        .collect()
    }
    assert(e.getMessage.contains("does not fit"))
    intercept[IllegalArgumentException] {
      FixedWidth.parseLines(Seq("x").toDF("value"), "value",
        Seq(Field("a", 1, 5), Field("b", 3, 5)))
    }
  }

  test("file round-trip through spark.read.text") {
    val dir = "/tmp/graft_fixed_width_spec"
    val df = Seq((1L, "alpha", 10L), (2L, "beta", 20L))
      .toDF("id", "name", "amount")
    FixedWidth.write(df, dir, layout)
    val back = FixedWidth.read(spark, dir, layout).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "alpha", 10L), (2L, "beta", 20L)))
  }

  test("a partially covered numeric field is NULL, never a truncated number") {
    // line ends inside the amount field: digits present would parse as
    // a smaller valid number (r10 review fix)
    val r = parse("  123ACME      xxx  99").collect()
    assert(r(0).getLong(0) == 123L && r(0).isNullAt(2))
    // strings keep the right-trimmed-tail convention: partial is legal
    val r2 = parse("  123AC").collect()
    assert(r2(0).getString(1) == "AC")
  }
}
