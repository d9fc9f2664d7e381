package graft.text

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], len: Int, over: Int) =
    Chunker.chunks(docs.toDF("id", "text"), "id", "text", len, over)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("hand layout: 8 tokens, chunkLen 4, overlap 1 -> starts 0,3,6, tail ends at n") {
    val got = run(Seq((1L, "a b c d e f g h")), 4, 1)
    assert(got == Seq(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "d e f g"),
      (1L, 2L, 2L, "g h")))
  }

  test("short documents yield one whole-document chunk; every token covered exactly") {
    assert(run(Seq((1L, "x y")), 4, 1) == Seq((1L, 0L, 2L, "x y")))
    assert(run(Seq((1L, "a b c d")), 4, 1) == Seq((1L, 0L, 4L, "a b c d")))
    // boundary: n = chunkLen + 1 forces a second chunk
    val got = run(Seq((1L, "a b c d e")), 4, 1)
    assert(got.size == 2 && got(1) == ((1L, 1L, 2L, "d e")))
  }

  test("matches a plain-Scala layout over varied lengths and overlaps") {
    val texts = Seq.tabulate(12)(i => (i.toLong, (1 to (i * 3 + 1)).map(j => s"t$j").mkString(" ")))
    for ((len, over) <- Seq((5, 0), (5, 2), (8, 7), (3, 1))) {
      val stride = len - over
      val expect = texts.flatMap { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        val n = toks.size
        val last = if (n > len) (n - len + stride - 1) / stride else 0
        (0 to last).map { i =>
          val start = i * stride
          val piece = toks.slice(start, start + len)
          (id, i.toLong, piece.size.toLong, piece.mkString(" "))
        }
      }
      assert(run(texts, len, over) == expect, s"len=$len over=$over")
    }
  }

  test("contracts: NULL text drops; whale docs raise at maxChunks; bad params rejected") {
    val withNull = Seq((Some(1L), Some("a b")), (Some(2L), Option.empty[String]))
      .toDF("id", "text")
    assert(Chunker.chunks(withNull, "id", "text", 4, 1).count() == 1)
    val whale = Seq((1L, (1 to 100).map("w" + _).mkString(" "))).toDF("id", "text")
    val ex = intercept[Exception](
      Chunker.chunks(whale, "id", "text", 4, 2, maxChunks = 10).collect())
    assert(ex.getMessage.contains("more than 10 chunks"))
    intercept[IllegalArgumentException](
      Chunker.chunks(whale, "id", "text", 4, 4))
    intercept[IllegalArgumentException](
      Chunker.chunks(whale, "id", "text", 0, 0))
  }
}
