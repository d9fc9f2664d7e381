package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Systematic weighted sampling: grid-walk correctness against a serial
  * reference, mass conservation, heavy-row multiplicity, determinism
  * across partitioning, zero-weight rows never picked.
  */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  private def reference(ws: Seq[(Long, Long)], step: Long): Map[Long, Long] = {
    var cum = 0L
    ws.sortBy(_._1).flatMap { case (id, w) =>
      val before = cum / step; cum += w
      val copies = cum / step - before
      if (copies >= 1) Some(id -> copies) else None
    }.toMap
  }

  private def run(ws: Seq[(Long, Long)], step: Long, parts: Int = 4): Map[Long, Long] =
    WeightedSample.systematic(
        ws.toDF("id", "w").repartition(parts), "id", col("w"), step,
        bucketSize = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("matches the serial grid walk, any partitioning") {
    val ws = (1L to 200L).map(i => (i, (i * 7919) % 40))
    for (parts <- Seq(1, 7)) {
      assert(run(ws, step = 97, parts) === reference(ws, 97), s"parts $parts")
    }
  }

  test("total copies equal the grid points covered (mass conservation)") {
    val ws = (1L to 500L).map(i => (i, (i * 31) % 23))
    val total = ws.map(_._2).sum
    val got = run(ws, step = 50)
    assert(got.values.sum === total / 50)
  }

  test("a heavy row repeats (epoch-style oversampling)") {
    val ws = Seq((1L, 5L), (2L, 350L), (3L, 5L))
    val got = run(ws, step = 100)
    assert(got(2L) >= 3L) // 350 weight over step 100 covers >= 3 grid points
  }

  test("zero-weight rows are never picked") {
    val ws = Seq((1L, 0L), (2L, 100L), (3L, 0L), (4L, 100L))
    val got = run(ws, step = 100)
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got.values.sum === 2L)
  }
}
