package graft.llm

import graft.SparkSpec

/** MinHash estimator audit: identical docs agree on every hash, the
  * exact set counts ride along, unrelated docs never pair.
  */
class MinhashQualitySpec extends SparkSpec {

  import spark.implicits._

  test("identical pair: full signature agreement and exact set counts") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "xx yy zz ww qq"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashQuality(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // identical docs: every one of the k = 8 hashes agrees; 3 shingles
    // each, fully shared
    assert(got.toSeq == Seq((1L, 2L, 8L, 3L, 3L)))
  }

  test("partial overlap: agreement is a fraction and the sets are honest") {
    // shares a 4-word prefix so some band keys collide (deterministic)
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g zz"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashQuality(docs, "text", "doc_id").collect()
    if (got.nonEmpty) {
      val r = got.head
      // 6 shingles each, 5 shared, union 7
      assert(r.getLong(3) == 5L && r.getLong(4) == 7L)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 8L)
    }
  }
}
