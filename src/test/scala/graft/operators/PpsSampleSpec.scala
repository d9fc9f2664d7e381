package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequential Poisson sampling: hand priority replay, weight
  * monotonicity, the equal-weight collapse law, PPS rate sanity,
  * nested-prefix property, weight raises, tie determinism.
  */
class PpsSampleSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int, w: Long => Long) =
    (1 to n).map(i => ("g", i.toLong, w(i.toLong))).toDF("grp", "id", "w")

  private def md5u(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % PpsSample.HashMod
  }

  test("priorities replay the u div w formula exactly") {
    val df = docs(20, i => 1L + i % 5)
    val got = PpsSample.ppsN(df, Seq("grp"), col("id"), col("id"), "w", 20)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    (1 to 20).foreach { i =>
      assert(got(i.toLong) == md5u(i.toString) / (1L + i % 5))
    }
  }

  test("raising one item's weight never moves it down the order") {
    val base = PpsSample.ppsN(docs(100, _ => 10L), Seq("grp"),
      col("id"), col("id"), "w", 100).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    val boosted = docs(100, i => if (i == base.maxBy(_._2)._1) 1000L else 10L)
    val after = PpsSample.ppsN(boosted, Seq("grp"),
      col("id"), col("id"), "w", 100).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    val target = base.maxBy(_._2)._1
    assert(after(target) <= base(target))
    assert(after(target) == 1L || after(target) < base(target))
  }

  test("equal weights collapse to the content-hash sample's id set") {
    val df = docs(200, _ => 1L)
    val pps = PpsSample.ppsN(df, Seq("grp"), col("id"), col("id"), "w", 25)
      .collect().map(_.getLong(2)).toSet
    val plain = graft.text.CorpusFilters.sampleNPerGroup(
        df.withColumn("k", col("id").cast("string")),
        Seq("grp"), col("k"), col("id"), 25)
      .collect().map(_.getLong(2)).toSet
    assert(pps == plain)
  }

  test("heavy items are drawn at a visibly higher rate (PPS sanity)") {
    // 1000 items, every 10th carries weight 50 vs 1: the 100 heavies
    // should dominate a 100-item sample
    val df = docs(1000, i => if (i % 10 == 0) 50L else 1L)
    val ids = PpsSample.ppsN(df, Seq("grp"), col("id"), col("id"), "w", 100)
      .collect().map(_.getLong(2))
    val heavies = ids.count(_ % 10 == 0)
    assert(heavies > 60, s"expected heavy dominance, got $heavies/100")
  }

  test("a smaller n is a prefix of a larger n's sample") {
    val df = docs(300, i => 1L + (i * 7) % 13)
    def ids(n: Int) = PpsSample.ppsN(df, Seq("grp"), col("id"),
      col("id"), "w", n).orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(ids(10) == ids(40).take(10))
  }

  test("zero, negative, and NULL weights raise in-plan") {
    for (bad <- Seq(0L, -3L)) {
      val e = intercept[Exception] {
        PpsSample.ppsN(docs(5, _ => bad), Seq("grp"),
          col("id"), col("id"), "w", 3).collect()
      }
      assert(e.getMessage.contains("positive"))
    }
    val withNull = Seq(("g", 1L, Some(2L)), ("g", 2L, None))
      .toDF("grp", "id", "w")
    val e = intercept[Exception] {
      PpsSample.ppsN(withNull, Seq("grp"), col("id"), col("id"), "w", 2)
        .collect()
    }
    assert(e.getMessage.contains("positive"))
  }

  test("floored ties break on ascending id") {
    // huge weights floor every priority to 0: order becomes pure id order
    val df = docs(6, _ => 1L << 60)
    val got = PpsSample.ppsN(df, Seq("grp"), col("id"), col("id"), "w", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L)))
  }
}
