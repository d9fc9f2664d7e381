package graft.llm

import graft.SparkSpec

/** SimHash estimator audit: identical docs pair at hamming 0 with full
  * set agreement; beyond-radius candidates still surface (the audit is
  * candidate-sized, not radius-cut); the hamming column matches a
  * direct fingerprint xor.
  */
class SimhashQualitySpec extends SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("identical pair: hamming 0, exact set counts") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashQuality(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 0L, 3L, 3L)))
  }

  test("radius-2 banding at 64 bits: 21/22-bit band keys partition all 64 bits") {
    // maxHamming=2 → 3 pigeonhole bands over the 64-bit fingerprint:
    // widths (22, 21, 21), offsets (0, 22, 43) — exactly covering [0, 64)
    val layout = Dedup.simhashBandLayout(maxHamming = 2)
    assert(layout == Seq((0, 22), (22, 21), (43, 21)))
    assert(layout.map(_._2).sum == Dedup.SimHashBits)
    assert(Dedup.SimHashBits == 64)
    // pigeonhole completeness survives negative fingerprints (bit 63 set):
    // two docs within radius 2 MUST collide on at least one band, because
    // ≤2 differing bits can't touch all 3 disjoint bands — verified here
    // on docs whose fingerprints actually use the high band
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about databases and queries"))
      .toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical docs: hamming 0, always a candidate via every band
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    // brute-force agreement over the 64-bit fingerprints
    val want = (for {
      (ia, fa) <- fp; (ib, fb) <- fp if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 2
    } yield (ia, ib, h.toLong)).toSet
    assert(pairs.toSet == want)
  }

  test("hamming matches a direct fingerprint xor on every candidate") {
    // candidacy is band-collision-dependent (64-bit pigeonhole), so the
    // only guaranteed pair is the identical one; whatever else collides
    // must report its TRUE distance — including beyond-radius values,
    // which the audit keeps rather than cutting
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta"),
      (4L, "one two three four five six"))
      .toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
        Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.simhashQuality(docs, "text", "doc_id", maxHamming = 2)
      .collect()
    got.foreach { r =>
      val want = java.lang.Long.bitCount(fp(r.getLong(0)) ^ fp(r.getLong(1)))
      assert(r.getLong(2) == want.toLong)
    }
    // identical docs share every band: always a candidate, at hamming 0
    assert(got.exists(r =>
      r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 0L))
  }
}
