package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

/** Interval conformance: each violation class isolated, clean keys
  * absent, SCD2 build output audits clean.
  */
class IntervalAuditSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String): Option[Timestamp] = Some(Timestamp.valueOf(s))

  test("overlap, gap, and mid-stream open intervals are counted per key") {
    val dim = Seq(
      // key 1: clean tiling — must be ABSENT from the audit
      (1L, t("2024-01-01 00:00:00"), t("2024-02-01 00:00:00"), 1L),
      (1L, t("2024-02-01 00:00:00"), None, 2L),
      // key 2: overlap (second starts before first ends)
      (2L, t("2024-01-01 00:00:00"), t("2024-03-01 00:00:00"), 1L),
      (2L, t("2024-02-01 00:00:00"), None, 2L),
      // key 3: gap
      (3L, t("2024-01-01 00:00:00"), t("2024-02-01 00:00:00"), 1L),
      (3L, t("2024-03-01 00:00:00"), None, 2L),
      // key 4: open-ended version in the middle
      (4L, t("2024-01-01 00:00:00"), None, 1L),
      (4L, t("2024-02-01 00:00:00"), None, 2L))
      .toDF("k", "valid_from", "valid_to", "seq")
    val got = IntervalAudit.audit(dim, "k", "valid_from", "valid_to", "seq")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (2L, 2L, 1L, 0L, 0L),
      (3L, 2L, 0L, 1L, 0L),
      (4L, 2L, 0L, 0L, 1L)))
  }

  test("a built SCD2 dimension audits clean") {
    val changes = Seq(
      (7L, "a", t("2024-01-01 00:00:00").get, 1L),
      (7L, "b", t("2024-02-01 00:00:00").get, 2L),
      (7L, "b", t("2024-03-01 00:00:00").get, 3L), // no-op collapses
      (8L, "x", t("2024-01-15 00:00:00").get, 4L))
      .toDF("k", "status", "eff", "seq")
    val dim = Scd2.build(changes, "k", Seq("status"), "eff", "seq")
    assert(IntervalAudit.audit(dim, "k", "valid_from", "valid_to", "seq")
      .count() == 0L)
  }
}
