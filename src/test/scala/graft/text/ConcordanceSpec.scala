package graft.text

import graft.SparkSpec

/** KWIC: hand contexts, edge clipping, multiple hits, case
  * sensitivity, contracts.
  */
class ConcordanceSpec extends SparkSpec {

  import spark.implicits._

  private def kwic(text: String, term: String, w: Int = 2) =
    Concordance.kwic(Seq((1L, text)).toDF("id", "txt"), "id", "txt", term, w)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq

  test("hand contexts around a mid-document hit") {
    assert(kwic("a b c X d e f", "X") == Seq((4L, "b c", "d e")))
  }

  test("document edges clip honestly") {
    assert(kwic("X a b", "X") == Seq((1L, "", "a b")))
    assert(kwic("a b X", "X") == Seq((3L, "a b", "")))
    assert(kwic("X", "X") == Seq((1L, "", "")))
  }

  test("every occurrence reports, including adjacent ones") {
    assert(kwic("X X a", "X") ==
      Seq((1L, "", "X a"), (2L, "X", "a")))
  }

  test("matching is case-sensitive and exact") {
    assert(kwic("x a X", "X") == Seq((3L, "x a", "")))
    assert(kwic("Xy a", "X").isEmpty)
  }

  test("window size bounds the context") {
    assert(kwic("a b c d X e f g h", "X", w = 3) ==
      Seq((5L, "b c d", "e f g")))
  }

  test("contracts: empty or multi-token terms reject") {
    intercept[IllegalArgumentException] {
      Concordance.kwic(Seq((1L, "a")).toDF("id", "txt"), "id", "txt", "", 2)
    }
    intercept[IllegalArgumentException] {
      Concordance.kwic(Seq((1L, "a")).toDF("id", "txt"), "id", "txt", "a b", 2)
    }
  }
}
