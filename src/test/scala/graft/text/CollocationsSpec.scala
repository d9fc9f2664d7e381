package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PMI collocations vs a hand-rolled reference: counts, quantized PMI,
  * pruning, degenerate documents, partitioning independence.
  */
class CollocationsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    "new york new york city",
    "new york is big",
    "the city is big",
    "the the the",
    "solo",
    ""
  ).toDF("text")

  /** Plain-Scala reference over the same definitions. */
  private def expected(minCount: Long): Map[(String, String), (Long, Long, Long, Long)] = {
    val tokenLists = Seq(
      Seq("new", "york", "new", "york", "city"),
      Seq("new", "york", "is", "big"),
      Seq("the", "city", "is", "big"),
      Seq("the", "the", "the"),
      Seq("solo"),
      Seq(""))
    val uni = tokenLists.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = tokenLists.map(_.size.toLong).sum
    val b = tokenLists.map(l => math.max(l.size - 1, 0).toLong).sum
    val pairs = tokenLists.flatMap(l => l.zip(l.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    pairs.collect { case ((x, y), cxy) if cxy >= minCount =>
      val arg = cxy.toDouble * t.toDouble / b.toDouble * t.toDouble /
        uni(x).toDouble / uni(y).toDouble
      (x, y) -> (cxy, uni(x), uni(y),
        math.floor(Collocations.Scale.toDouble * math.log(arg)).toLong)
    }.toMap
  }

  test("matches the reference at minCount=1, any partitioning") {
    for (parts <- Seq(1, 5)) {
      val got = Collocations.pmi(docs.repartition(parts), "text", minCount = 1L)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(got === expected(1L), s"partitioning $parts")
    }
  }

  test("minCount prunes the hapax tail") {
    val got = Collocations.pmi(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("new", "york"), ("is", "big"), ("the", "the")))
  }

  test("repeated-token phrase scores above an incidental pair") {
    val g = Collocations.pmi(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // "new york" always co-occurs; "is big" appears with independent parts
    assert(g(("new", "york")) > g(("city", "is")))
  }

  test("one-token and empty documents contribute no pairs") {
    val tiny = Seq("solo", "").toDF("text")
    assert(Collocations.pmi(tiny, "text", minCount = 1L).count() === 0L)
  }
}
