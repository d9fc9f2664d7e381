package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Business days: JDK-replayed brute-force differential across all
  * weekday offsets, holiday subtraction incl. weekend holidays,
  * add-roll hand cases, both raises, NULL propagation.
  */
class BusinessDaysSpec extends SparkSpec {

  import spark.implicits._

  private def bruteCount(s: java.time.LocalDate, e: java.time.LocalDate,
                         hol: Set[java.time.LocalDate]): Long =
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e))
      .count(d => d.getDayOfWeek.getValue <= 5 && !hol.contains(d)).toLong

  test("brute-force differential over every start weekday × span 0..20") {
    val rows = for (off <- 0 until 7; span <- 0 until 21)
      yield ("2024-01-01", off, span) // 2024-01-01 is a Monday
    val df = rows.toDF("base", "off", "span")
      .select(expr("date_add(CAST(base AS DATE), off)").as("s"),
        expr("date_add(CAST(base AS DATE), off + span)").as("e"))
    val got = df.select(col("s"), col("e"),
      BusinessDays.businessDays(col("s"), col("e")).as("bd")).collect()
    got.foreach { r =>
      val s = r.getDate(0).toLocalDate; val e = r.getDate(1).toLocalDate
      assert(r.getLong(2) == bruteCount(s, e, Set.empty),
        s"mismatch for [$s, $e]")
    }
  }

  test("weekday holidays subtract; weekend holidays are inert") {
    // 2024-01-01 Mon .. 2024-01-07 Sun: 5 business days
    val df = Seq(("2024-01-01", "2024-01-07")).toDF("s", "e")
    def bd(hs: Seq[String]) = df.select(
      BusinessDays.businessDays(col("s"), col("e"), hs)).head().getLong(0)
    assert(bd(Seq.empty) == 5L)
    assert(bd(Seq("2024-01-01")) == 4L)          // Monday holiday
    assert(bd(Seq("2024-01-06")) == 5L)          // Saturday: inert
    assert(bd(Seq("2023-12-25")) == 5L)          // out of range
    assert(bd(Seq("2024-01-01", "2024-01-02")) == 3L)
  }

  test("addBusinessDays: weekend crossings and multi-week jumps") {
    val df = Seq(("2024-01-05", 1), ("2024-01-05", 0), ("2024-01-01", 4),
      ("2024-01-01", 5), ("2024-01-03", 13)).toDF("s", "n")
    val got = df.select(BusinessDays.addBusinessDays(col("s"), col("n")))
      .collect().map(_.getDate(0).toString)
    // Fri+1 -> Mon; Fri+0 -> Fri; Mon+4 -> Fri; Mon+5 -> next Mon;
    // Wed Jan 3 + 13 -> Mon Jan 22
    assert(got.toSeq == Seq("2024-01-08", "2024-01-05", "2024-01-05",
      "2024-01-08", "2024-01-22"))
  }

  test("start after end raises; weekend start for add raises") {
    val e1 = intercept[Exception] {
      Seq(("2024-01-05", "2024-01-04")).toDF("s", "e")
        .select(BusinessDays.businessDays(col("s"), col("e"))).collect()
    }
    assert(e1.getMessage.contains("after end"))
    val e2 = intercept[Exception] {
      Seq(("2024-01-06", 1)).toDF("s", "n")
        .select(BusinessDays.addBusinessDays(col("s"), col("n"))).collect()
    }
    assert(e2.getMessage.contains("is a weekend"))
    val e3 = intercept[Exception] {
      Seq(("2024-01-05", -1)).toDF("s", "n")
        .select(BusinessDays.addBusinessDays(col("s"), col("n"))).collect()
    }
    assert(e3.getMessage.contains("must be >= 0"))
  }

  test("NULL dates propagate NULL, never a raise") {
    val df = Seq((Some("2024-01-01"), None: Option[String]))
      .toDF("s", "e")
    val r = df.select(
      BusinessDays.businessDays(to_date(col("s")), to_date(col("e"))))
      .head()
    assert(r.isNullAt(0))
  }
}
