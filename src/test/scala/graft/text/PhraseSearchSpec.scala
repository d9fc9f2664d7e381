package graft.text

import graft.SparkSpec

/** Phrase search: hand positions, overlapping and repeated-term
  * phrases, the distinct-slot subtlety, single-token phrases, argument
  * contracts, NULL drops.
  */
class PhraseSearchSpec extends SparkSpec {

  import spark.implicits._

  private def hits(text: String, phrase: String*): Seq[Long] =
    PhraseSearch.phraseMatches(
        Seq((1L, text)).toDF("id", "txt"), "id", "txt", phrase)
      .collect().map(_.getLong(1)).sorted.toSeq

  test("simple bigram: every start position, 1-based") {
    assert(hits("a b c b c", "b", "c") == Seq(2L, 4L))
  }

  test("overlapping occurrences all report") {
    assert(hits("a a a a", "a", "a", "a") == Seq(1L, 2L))
  }

  test("repeated-term phrase aligns on anchors, not bags") {
    assert(hits("a b a b a", "a", "b", "a") == Seq(1L, 3L))
    // both tokens present but never adjacent twice: no match
    assert(hits("b c b", "b", "b").isEmpty)
    assert(hits("b b", "b", "b") == Seq(1L))
  }

  test("single-token phrase is plain occurrence lookup") {
    assert(hits("x y x", "x") == Seq(1L, 3L))
  }

  test("missing term or phrase longer than the doc: no rows") {
    assert(hits("a b c", "z").isEmpty)
    assert(hits("a b", "a", "b", "c").isEmpty)
  }

  test("counts roll up per document with first position") {
    val docs = Seq((1L, "t t t"), (2L, "x t t"), (3L, "x y z"))
      .toDF("id", "txt")
    val got = PhraseSearch.phraseCounts(docs, "id", "txt", Seq("t", "t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (2L, 1L), 2L -> (1L, 2L)))
  }

  test("argument contracts raise; NULL id/text rows drop") {
    intercept[IllegalArgumentException] {
      PhraseSearch.phraseMatches(Seq((1L, "a")).toDF("id", "txt"),
        "id", "txt", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      PhraseSearch.phraseMatches(Seq((1L, "a")).toDF("id", "txt"),
        "id", "txt", Seq("a b"))
    }
    val docs = Seq((Some(1L), Some("a b")), (None, Some("a b")),
      (Some(3L), None)).toDF("id", "txt")
    val got = PhraseSearch.phraseMatches(docs, "id", "txt", Seq("a", "b"))
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }
}
