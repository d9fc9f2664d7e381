package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-normalization contracts: endpoints 0/SCALE, tie determinism,
  * singleton midpoint, per-group independence, NULL drops.
  */
class QuantileNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: (Long, String, Long)*) =
    QuantileNormalize.rankNormalize(
        rows.toSeq.toDF("id", "g", "v"), Seq("g"), "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("endpoints and interior positions, per group") {
    val got = run(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L), (5L, "a", 50L),
      (10L, "b", 7L), (11L, "b", 9L))
    assert(got(1L) == 0L && got(5L) == 1000000L)
    assert(got(2L) == 250000L && got(3L) == 500000L && got(4L) == 750000L)
    assert(got(10L) == 0L && got(11L) == 1000000L) // group b independent
  }

  test("ties order by id (deterministic total order)") {
    val got = run((2L, "a", 10L), (1L, "a", 10L), (3L, "a", 10L))
    assert(got == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L))
  }

  test("a singleton group maps to the midpoint; NULL values drop") {
    val df = Seq((1L, "a", Some(5L)), (2L, "b", None))
      .toDF("id", "g", "v")
    val got = QuantileNormalize.rankNormalize(df, Seq("g"), "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 500000L))
  }

  test("partitioning independence") {
    val rows = (1L to 200L).map(i => (i, s"g${i % 3}", (i * 37) % 50))
    def m(p: Int) = QuantileNormalize.rankNormalize(
        rows.toDF("id", "g", "v").repartition(p), Seq("g"), "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(1) == m(7))
  }
}
