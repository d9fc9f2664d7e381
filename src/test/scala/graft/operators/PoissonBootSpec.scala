package graft.operators

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class PoissonBootSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Long, Long)] =
    for { g <- Seq("a", "b"); i <- 1 to 200 }
      yield (g, g.hashCode.toLong * 1000 + i, (i % 37).toLong - 5)

  private def refWeight(id: String, rep: Int): Long = {
    val h = graft.functions.Md5Prefix60.hash60(
      UTF8String.fromString(s"$id:$rep"))
    val k = PoissonBoot.Thresholds.indexWhere(h < _)
    if (k < 0) PoissonBoot.MaxWeight else k.toLong
  }

  test("replicates match a plain-Scala hash60 replay; weights average ~1") {
    val df = rows.toDF("g", "id", "x")
    val got = PoissonBoot.replicates(df, "g", "id", "x", reps = 8)
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val expect = (for {
      g <- Seq("a", "b"); r <- 1 to 8
    } yield ((g, r),
      rows.filter(_._1 == g).map { case (_, id, x) => refWeight(id.toString, r) * x }.sum)).toMap
    assert(got == expect)
    // mean weight over 400 rows x 8 reps should be near 1 (law of large numbers,
    // deterministic fixture -> a fixed assertable band)
    val totalW = (for { (_, id, _) <- rows; r <- 1 to 8 }
      yield refWeight(id.toString, r)).sum
    assert(math.abs(totalW - 3200L) < 300L, s"total weight $totalW")
  }

  test("summary publishes the exact total and ordered rank bounds") {
    val df = rows.toDF("g", "id", "x")
    val reps = 16
    val got = PoissonBoot.summary(df, "g", "id", "x", reps, loRank = 1, hiRank = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    val bootByG = PoissonBoot.replicates(df, "g", "id", "x", reps)
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(2)).sorted }
    for ((g, n, total, lo, hi) <- got) {
      assert(n == 200L)
      assert(total == rows.filter(_._1 == g).map(_._3).sum)
      assert(lo == bootByG(g).head && hi == bootByG(g).last)
      assert(lo <= hi)
    }
  }

  test("NULL id/value rows drop; NULL group is a stratum; contracts raise") {
    val df = Seq((Some("g"), Some(1L), Some(10L)),
      (Some("g"), Option.empty[Long], Some(10L)),
      (Some("g"), Some(2L), Option.empty[Long]),
      (Option.empty[String], Some(3L), Some(5L))).toDF("g", "id", "x")
    val got = PoissonBoot.summary(df, "g", "id", "x", reps = 4, loRank = 1, hiRank = 4)
      .collect()
    assert(got.length == 2)
    assert(got.find(!_.isNullAt(0)).get.getLong(1) == 1L)
    intercept[IllegalArgumentException](
      PoissonBoot.replicates(df, "g", "id", "x", reps = 1))
    intercept[IllegalArgumentException](
      PoissonBoot.summary(df, "g", "id", "x", reps = 8, loRank = 3, hiRank = 2))
    intercept[IllegalArgumentException](
      PoissonBoot.summary(df, "g", "id", "x", reps = 8, loRank = 1, hiRank = 9))
  }
}
