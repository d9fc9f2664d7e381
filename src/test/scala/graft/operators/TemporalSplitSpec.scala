package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal embargo split: threshold semantics, embargo exclusivity,
  * leakage audit, NULL contracts.
  */
class TemporalSplitSpec extends SparkSpec {

  import spark.implicits._

  test("split rule: strict thresholds, embargo band used by neither side") {
    val df = Seq((9L, "u1"), (10L, "u2"), (12L, "u3"), (13L, "u4"))
      .toDF("i", "e")
    val m = TemporalSplit.assign(df, "i", boundary = 10L, embargoLen = 3L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(m == Map(9L -> "train", 10L -> "embargo", 12L -> "embargo",
      13L -> "test"))
    // zero embargo degrades to a plain boundary split
    val m0 = TemporalSplit.assign(df, "i", boundary = 10L, embargoLen = 0L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(m0(10L) == "test")
  }

  test("summary counts rows and entities per side; NULL idx rows drop from the summary") {
    val df = Seq((Some(1L), "u1"), (Some(2L), "u1"), (Some(20L), "u2"),
      (Option.empty[Long], "u3")).toDF("i", "e")
    val got = TemporalSplit.summary(df, "i", "e", 10L, 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_entities")))).toMap
    assert(got == Map("train" -> ((2L, 1L)), "test" -> ((1L, 1L))))
  }

  test("entity leakage: only entities on BOTH sides; embargo-only presence is not a leak") {
    val df = Seq(
      (1L, "both"), (20L, "both"),
      (2L, "trainOnly"),
      (21L, "testOnly"),
      (3L, "trainAndEmbargo"), (11L, "trainAndEmbargo"))
      .toDF("i", "e")
    val got = TemporalSplit.entityLeakage(df, "i", "e", 10L, 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("both", 1L, 1L)))
  }
}
