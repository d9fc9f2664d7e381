package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintained quantile store: batched folds ≡ one continuous aggregation
  * (exact regime), rank-error bound in the compacting regime, store
  * bootstrap/merge/read-back, and batching independence.
  */
class QuantileStoreSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("qstore").toString

  test("exact regime: N batch folds equal direct per-group quantiles") {
    val dir = freshDir()
    val rows = (1 to 90).map(i => (s"g${i % 3}", (i * 37 % 100).toLong))
    val all = rows.toDF("g", "v")
    (0 until 3).foreach { b =>
      QuantileStore.update(spark, dir,
        rows.filter(_._2 % 3 == b).toDF("g", "v"), Seq("g"), col("v"), k = 64)
    }
    val folded = QuantileStore.quantiles(QuantileStore.read(spark, dir),
        Seq("g"), k = 64, qs = Seq((1L, 2L), (9L, 10L)), names = Seq("p50", "p90"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val direct = graft.functions.Quantiles.perGroup(all, Seq("g"), col("v"),
        k = 64, qs = Seq((1L, 2L), (9L, 10L)), names = Seq("p50", "p90"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(folded === direct)
  }

  test("batching independence in the exact regime: 1 fold ≡ 5 folds") {
    val rows = (1 to 100).map(i => ("g", (i * 13 % 50).toLong))
    def fold(splits: Int): Seq[Long] = {
      val dir = freshDir()
      (0 until splits).foreach { b =>
        QuantileStore.update(spark, dir,
          rows.filter(_._2 % splits == b).toDF("g", "v"), Seq("g"), col("v"), k = 64)
      }
      QuantileStore.quantiles(QuantileStore.read(spark, dir), Seq("g"),
          k = 64, qs = Seq((1L, 4L), (3L, 4L)), names = Seq("p25", "p75"))
        .as[(String, Long, Long)].collect().map(t => Seq(t._2, t._3)).head
    }
    assert(fold(1) === fold(5))
  }

  test("compacting regime: folded quantiles stay inside the KLL rank bound") {
    val dir = freshDir()
    val n = 4000
    val rows = (1 to n).map(i => ("g", ((i * 2654435761L) % 10000).toLong))
    (0 until 4).foreach { b =>
      QuantileStore.update(spark, dir,
        rows.zipWithIndex.filter(_._2 % 4 == b).map(_._1).toDF("g", "v"),
        Seq("g"), col("v"), k = 32)
    }
    val p50 = QuantileStore.quantiles(QuantileStore.read(spark, dir), Seq("g"),
        k = 32, qs = Seq((1L, 2L)), names = Seq("p50"))
      .as[(String, Long)].collect().head._2
    val sorted = rows.map(_._2).sorted
    val rank = sorted.indexWhere(_ >= p50)
    // rank of the reported p50 within ~12% of the true median rank
    assert(math.abs(rank - n / 2) < n * 0.12, s"rank $rank vs ${n / 2}")
  }

  test("k is persisted; a mismatched k fails loudly on update and quantiles") {
    val dir = freshDir()
    QuantileStore.update(spark, dir, Seq(("g", 1L), ("g", 2L)).toDF("g", "v"),
      Seq("g"), col("v"), k = 64)
    val eU = intercept[IllegalArgumentException] {
      QuantileStore.update(spark, dir, Seq(("g", 3L)).toDF("g", "v"),
        Seq("g"), col("v"), k = 8)
    }
    assert(eU.getMessage.contains("k=64") && eU.getMessage.contains("k=8"))
    val eQ = intercept[IllegalArgumentException] {
      QuantileStore.quantiles(QuantileStore.read(spark, dir), Seq("g"),
        k = 8, qs = Seq((1L, 2L)), names = Seq("p50"))
    }
    assert(eQ.getMessage.contains("k=64"))
    // the matching k still works after the failed attempts
    QuantileStore.update(spark, dir, Seq(("g", 3L)).toDF("g", "v"),
      Seq("g"), col("v"), k = 64)
    val q = QuantileStore.quantiles(QuantileStore.read(spark, dir), Seq("g"),
        k = 64, qs = Seq((1L, 2L)), names = Seq("p50"))
      .as[(String, Long)].collect().toSeq
    assert(q === Seq(("g", 2L)))
  }

  test("store bootstrap, read-back, and empty-batch no-op") {
    val dir = freshDir()
    QuantileStore.update(spark, dir, Seq(("g", 1L)).toDF("g", "v"),
      Seq("g"), col("v"), k = 8)
    QuantileStore.update(spark, dir,
      Seq.empty[(String, Long)].toDF("g", "v"), Seq("g"), col("v"), k = 8)
    val q = QuantileStore.quantiles(QuantileStore.read(spark, dir), Seq("g"),
        k = 8, qs = Seq((1L, 2L)), names = Seq("p50"))
      .as[(String, Long)].collect().toSeq
    assert(q === Seq(("g", 1L)))
  }
}
