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
}
