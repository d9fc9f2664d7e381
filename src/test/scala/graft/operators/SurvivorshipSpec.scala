package graft.operators

import graft.SparkSpec

/** Golden-record survivorship: per-attribute independent election,
  * non-null-first / recency / id rule, all-NULL attribute, id contract.
  */
class SurvivorshipSpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq(
    // cluster 1: three sources — each attribute should elect from a
    // DIFFERENT record (elections are independent)
    (1L, 10L, 3L, Some("alice"), Option.empty[String], Some(100.0)),
    (1L, 11L, 5L, Option.empty[String], Some("RETAIL"), Some(200.0)),
    (1L, 12L, 5L, Some("alyce"), Some("AUTO"), Option.empty[Double]),
    // cluster 2: every name NULL → elects NULL; recency tie at 7 →
    // lowest id wins the balance
    (2L, 20L, 7L, Option.empty[String], Some("BANK"), Some(5.0)),
    (2L, 21L, 7L, Option.empty[String], Some("LOAN"), Some(6.0))
  ).toDF("cluster", "id", "rec", "name", "seg", "bal")

  test("per-attribute election: non-null first, recency desc, id asc") {
    val got = Survivorship.goldenRecords(rows, "cluster", "id", "rec",
      Seq("name", "seg", "bal")).orderBy("cluster").collect()
    assert(got.length == 2)
    val c1 = got(0)
    assert(c1.getLong(1) == 3L)
    // name: non-null are id 10 (rec 3) and id 12 (rec 5) → "alyce"
    assert(c1.getString(2) == "alyce")
    // seg: non-null are id 11 and id 12, both rec 5 → lowest id → RETAIL
    assert(c1.getString(3) == "RETAIL")
    // bal: non-null are id 10 (rec 3) and id 11 (rec 5) → 200.0
    assert(c1.getDouble(4) == 200.0)
    val c2 = got(1)
    assert(c2.isNullAt(2)) // all names NULL → NULL, not fabricated
    assert(c2.getString(3) == "BANK") // rec tie → id 20 < 21
    assert(c2.getDouble(4) == 5.0)
  }

  test("a whale cluster elects identically to a singleton scan") {
    val whale = (1L to 500L).map { i =>
      (9L, i, i % 7, if (i % 3 == 0) None else Some(s"v$i"))
    }.toDF("cluster", "id", "rec", "name")
    val got = Survivorship.goldenRecords(whale, "cluster", "id", "rec",
      Seq("name")).head()
    // expected: non-null names with max rec (6), lowest id among them.
    // i%7==6 and i%3!=0: i=13 is the smallest
    assert(got.getString(2) == "v13")
  }

  test("non-integral id refuses loudly; empty attrs refuses") {
    val bad = Seq(("a", "b", 1L, "x")).toDF("cluster", "id", "rec", "name")
    val ex = intercept[IllegalArgumentException] {
      Survivorship.goldenRecords(bad, "cluster", "id", "rec", Seq("name"))
    }
    assert(ex.getMessage.contains("integral"))
    val ok = Seq((1L, 1L, 1L, "x")).toDF("cluster", "id", "rec", "name")
    intercept[IllegalArgumentException] {
      Survivorship.goldenRecords(ok, "cluster", "id", "rec", Seq.empty)
    }
  }
}
