package graft.operators

import graft.SparkSpec
import java.sql.Date

/** Bitemporal: late corrections visible only after their tx time,
  * validity containment, deterministic supersession.
  */
class BitemporalSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // key 1: June address recorded Jan 5 as "old", corrected Jan 20 to "new"
  private def log = Seq(
    (1L, d("2024-06-01"), d("2024-07-01"), d("2024-01-05"), "old"),
    (1L, d("2024-06-01"), d("2024-07-01"), d("2024-01-20"), "new"),
    (2L, d("2024-01-01"), d("2024-12-31"), d("2024-01-02"), "k2"))
    .toDF("k", "vf", "vt", "tx", "addr")

  test("the answer depends on WHEN you ask, not just about when") {
    val early = Bitemporal.asOf(log, "k", "vf", "vt", "tx", Seq("addr"),
      txAsOf = "2024-01-10", validAt = "2024-06-15").collect()
      .map(r => (r.getLong(0), r.getString(4))).toSet
    assert(early == Set((1L, "old"), (2L, "k2")))
    val late = Bitemporal.asOf(log, "k", "vf", "vt", "tx", Seq("addr"),
      txAsOf = "2024-02-01", validAt = "2024-06-15").collect()
      .map(r => (r.getLong(0), r.getString(4))).toSet
    assert(late == Set((1L, "new"), (2L, "k2")))
  }

  test("validity containment: a V outside every interval is a miss") {
    val got = Bitemporal.asOf(log, "k", "vf", "vt", "tx", Seq("addr"),
      txAsOf = "2024-02-01", validAt = "2024-08-15").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(2L)) // key 1 has no assertion covering August
  }

  test("half-open validity: V = valid_to misses, V = valid_from hits") {
    val at = (v: String) => Bitemporal.asOf(log, "k", "vf", "vt", "tx",
      Seq("addr"), txAsOf = "2024-02-01", validAt = v)
      .where($"k" === 1L).count()
    assert(at("2024-07-01") == 0L)
    assert(at("2024-06-01") == 1L)
  }

  test("empty and NULL assertions drop") {
    val bad = Seq(
      (3L, d("2024-01-05"), d("2024-01-05"), d("2024-01-01"), "empty"),
      (3L, d("2024-01-01"), null.asInstanceOf[Date], d("2024-01-01"), "x"))
      .toDF("k", "vf", "vt", "tx", "addr")
    assert(Bitemporal.asOf(bad, "k", "vf", "vt", "tx", Seq("addr"),
      txAsOf = "2024-02-01", validAt = "2024-01-05").count() == 0L)
  }
}
