package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ARI: hand pair counts, identical-partition and label-rename
  * invariance, independent-partition chance level, NULL drops.
  */
class RandIndexSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: the textbook 6-row example") {
    // A = {1,1,1,2,2,2}, B = {1,1,2,2,3,3}
    // cells: (1,1)=2 (1,2)=1 (2,2)=1 (2,3)=2
    // same_both = 1 + 0 + 0 + 1 = 2; same_a = 3 + 3 = 6;
    // same_b = 1 + 1 + 1 = 3; n_pairs = 15
    val df = Seq((1, 1), (1, 1), (1, 2), (2, 2), (2, 3), (2, 3))
      .toDF("a", "b")
    val r = RandIndex.adjustedRand(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("same_both") == 2L)
    assert(r.getAs[Long]("same_a") == 6L)
    assert(r.getAs[Long]("same_b") == 3L)
    assert(r.getAs[Long]("n_pairs") == 15L)
    // ari = (2 - 6*3/15) / ((6+3)/2 - 6*3/15) = 0.8/3.3
    assert(math.abs(r.getAs[Double]("ari") - 0.8 / 3.3) < 1e-12)
  }

  test("identical partitions score 1 — including under label renames") {
    val df = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"), (3, "z"))
      .toDF("a", "b")
    val r = RandIndex.adjustedRand(df, "a", "b").collect().head
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("single-cluster vs all-singletons is the degenerate convention") {
    // a puts everything together, b splits everything: same_both=0,
    // same_b=0 -> ari = (0 - 0)/((sa+0)/2 - 0) = 0
    val df = (1 to 5).map(i => (1, i)).toDF("a", "b")
    val r = RandIndex.adjustedRand(df, "a", "b").collect().head
    assert(r.getAs[Long]("same_both") == 0L)
    assert(r.getAs[Double]("ari") == 0.0)
  }

  test("NULL labels drop their row") {
    val df = Seq((Some(1), Some(1)), (None, Some(2)), (Some(2), None),
      (Some(1), Some(1))).toDF("a", "b")
    val r = RandIndex.adjustedRand(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("n_pairs") == 1L)
  }

  test("B-cubed: textbook asymmetry — over-merging hurts precision, over-splitting recall") {
    // gold: {1,2,3} {4,5}; sys merges everything into one cluster
    val merged = Seq((1L, "x", "g1"), (2L, "x", "g1"), (3L, "x", "g1"),
      (4L, "x", "g2"), (5L, "x", "g2")).toDF("id", "sys", "gold")
    val m = RandIndex.bCubed(merged, "sys", "gold").collect().head
    // precision: (9/5 + 4/5)/5 = 13/25 = 0.52; recall: per-term-floored 1.0
    assert(m.getAs[Long]("bcubed_prec_q6") == 520000L)
    assert(m.getAs[Long]("bcubed_rec_q6") >= 999998L)
    // sys splits every item into singletons: precision 1, recall (3/9·3 + 2/4·2)/5
    val split = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g1"),
      (4L, "d", "g2"), (5L, "e", "g2")).toDF("id", "sys", "gold")
    val sp = RandIndex.bCubed(split, "sys", "gold").collect().head
    assert(sp.getAs[Long]("bcubed_prec_q6") >= 999998L)
    // recall = (1/3)·(3/5) + (1/2)·(2/5) = 1/5 + 1/5 = 0.4 (floors)
    assert(math.abs(sp.getAs[Long]("bcubed_rec_q6") - 400000L) <= 2)
  }

  test("B-cubed: perfect clustering scores 1/1 up to per-cell floors; label names irrelevant") {
    val df = Seq((1L, "p", "g1"), (2L, "p", "g1"), (3L, "q", "g2"))
      .toDF("id", "sys", "gold")
    val r = RandIndex.bCubed(df, "sys", "gold").collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("n_cells") == 2L)
    assert(r.getAs[Long]("bcubed_prec_q6") >= 999998L)
    assert(r.getAs[Long]("bcubed_rec_q6") >= 999998L)
  }
}
