package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training vs a from-scratch reference implementation (the no-oracle
  * contract), merge fold semantics, early stopping, and encode counts.
  */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  // ---- reference implementation: textbook Sennrich over a word-count map
  private def refBpe(words: Map[String, Long], n: Int,
                     minCount: Long = 2L): Seq[(String, String)] = {
    var vocab = words.map { case (w, c) => (w.map(_.toString) :+ BpeTrain.Eow, c) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && out.length < n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      // UTF-8 byte order like Spark's binary string comparison, NOT Java's
      // UTF-16 code-unit order (they disagree for supplementary chars)
      def u8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(_ & 0xff).toSeq
      implicit val seqIntOrd: Ordering[Seq[Int]] = Ordering.Implicits.seqOrdering
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, u8(a), u8(b)) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b))
          vocab = vocab.map { case (syms, cnt) =>
            val merged = scala.collection.mutable.ArrayBuffer[String]()
            syms.foreach { s =>
              if (merged.nonEmpty && merged.last == a && s == b)
                merged(merged.length - 1) = a + b
              else merged += s
            }
            (merged.toIndexedSeq, cnt)
          }
        case _ => done = true
      }
    }
    out.toSeq
  }

  private def corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest").map(Tuple1(_)).toDF("text")

  test("learned merges equal the reference implementation, in order") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = refBpe(words, 12)
    val got = BpeTrain.learnMerges(corpus, "text", nMerges = 12)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("partitioning-independent merge list") {
    val a = BpeTrain.learnMerges(corpus.coalesce(1), "text", 8)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    val b = BpeTrain.learnMerges(corpus.repartition(7), "text", 8)
      .orderBy("rank").as[(Int, String, String)].collect().toSeq
    assert(a === b)
  }

  test("early stop: no pair reaches minCount") {
    val tiny = Seq("ab", "cd").map(Tuple1(_)).toDF("text") // every pair count 1
    assert(BpeTrain.learnMerges(tiny, "text", 10, minCount = 2).count() === 0L)
  }

  test("merge fold is leftmost non-overlapping: aaa under (a,a) -> [aa, a]") {
    val df = Seq(Tuple1("aaa")).toDF("text")
    // first merge must be (a,a) with count 2 (two adjacent pairs in one word)
    val m = BpeTrain.learnMerges(df, "text", 1, minCount = 1)
      .as[(Int, String, String)].head()
    assert(m === ((1, "a", "a")))
    val enc = BpeTrain.encode(df.withColumn("id", lit(1L)), "id", "text",
      Seq(("a", "a")))
      .as[(Long, Long)].head()
    assert(enc === ((1L, 3L))) // [aa, a, </w>]
  }

  test("encode counts shrink as merges apply and never drop below word count") {
    val docs = corpus.withColumn("id", monotonically_increasing_id())
    val merges = BpeTrain.learnMerges(corpus, "text", 10)
      .orderBy("rank").select("left", "right").as[(String, String)].collect().toSeq
    val before = BpeTrain.encode(docs, "id", "text", Nil)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    val after = BpeTrain.encode(docs, "id", "text", merges)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(after < before)
  }
}
