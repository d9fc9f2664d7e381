package graft.text

import graft.SparkSpec

/** Corpus-duplicated shingle share: hand df counts, short-text
  * fallback, within-doc repeats collapse, NULL contracts.
  */
class CorpusDupSpec extends SparkSpec {

  import spark.implicits._

  test("hand corpus: shared shingle counts once per doc") {
    val df = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d}
      (2L, "a b c x"),   // shingles {a b c, b c x}
      (3L, "z z z z"))   // shingles {z z z} (within-doc repeat collapses)
      .toDF("doc_id", "text")
    val got = CorpusDup.duplicatedShare(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_dup"), r.getAs[Long]("dup_share_q6")))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L), (3L, 1L, 0L, 0L)))
  }

  test("short-text fallback shingle duplicates across docs") {
    val df = Seq((1L, "hi there"), (2L, "hi there"), (3L, "bye"))
      .toDF("doc_id", "text")
    val got = CorpusDup.duplicatedShare(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Long]("dup_share_q6"))
    assert(got.toSeq == Seq(1000000L, 1000000L, 0L))
  }

  test("NULL id/text rows drop; minDf below 2 rejected") {
    val df = Seq((Some(1L), Some("a b c")), (Some(2L), None),
      (Option.empty[Long], Some("x y z"))).toDF("doc_id", "text")
    val got = CorpusDup.duplicatedShare(df, "doc_id", "text").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      CorpusDup.duplicatedShare(df, "doc_id", "text", minDf = 1)
    }
  }
}
