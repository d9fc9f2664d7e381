package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Label-noise screen: hand-checked majority votes, tiebreaks, NULL-label
  * contract, and agreement on the gate corpus against a local replay.
  */
class LabelAuditSpec extends SparkSpec {

  import spark.implicits._

  // four tight clusters on axis dims; vec 5 is a mislabeled member of the
  // dim-0 cluster (label 9 among label-1 neighbors)
  private def corpus = Seq(
    (1L, Array(10f, 0f, 0f, 0f), 1),
    (2L, Array(11f, 0f, 0f, 0f), 1),
    (3L, Array(12f, 0f, 0f, 0f), 1),
    (5L, Array(10f, 1f, 0f, 0f), 9),
    (7L, Array(0f, 0f, 30f, 0f), 2),
    (8L, Array(0f, 0f, 31f, 0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("mislabeled cluster member is flagged; consistent members are not") {
    val got = LabelAudit.labelConsistency(corpus, corpus, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // vec 5's 3 nearest are 1, 2, 3 (all label 1) → majority 1 ≠ own 9
    assert(got(5L) == ((9, 1, 3L, 0L, true)))
    // vec 1's nearest include 2, 3 (label 1) and 5 (label 9): majority 1
    assert(got(1L)._2 == 1 && !got(1L)._5)
    assert(got.size == corpus.count())
  }

  test("vote ties break to the smallest label") {
    // query 1 has exactly two neighbors with distinct labels: 2 (label 5)
    // and 3 (label 3) → 1 vote each → majority = smaller label 3
    val df = Seq(
      (1L, Array(10f, 0f), 1),
      (2L, Array(11f, 0f), 5),
      (3L, Array(9f, 0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = LabelAudit.labelConsistency(df, df.where(col("vec_id") === 1), k = 2)
      .collect().map(r => (r.getInt(2), r.getLong(3), r.getBoolean(5)))
    assert(got.toSeq == Seq((3, 1L, true)))
  }

  test("NULL-label rows neither vote nor get audited") {
    val df = Seq(
      (1L, Array(10f, 0f), Some(1)),
      (2L, Array(11f, 0f), Some(1)),
      (3L, Array(10.5f, 0f), None)
    ).toDF("vec_id", "embedding", "label")
    val got = LabelAudit.labelConsistency(df, df, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 3 is not audited; 1 and 2 see only each other (1 vote each)
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }
}
