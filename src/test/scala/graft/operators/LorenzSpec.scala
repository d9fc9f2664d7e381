package graft.operators

import graft.SparkSpec

/** Lorenz curve: hand cumulative shares, curve closure, perfect
  * equality diagonal, zero-total NULLs, NULL drops.
  */
class LorenzSpec extends SparkSpec {

  import spark.implicits._

  test("hand case: bottom half holds its exact cumulative share") {
    // values 1,1,2,6 over k=2: bottom bucket {1,1} holds 2/10,
    // top closes at 10/10
    val df = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 6L)).toDF("id", "v")
    val got = Lorenz.curve(df, "v", "id", k = 2).orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Long]("cum_n"), r.getAs[Long]("cum_value"),
        r.getAs[Long]("pop_q6"), r.getAs[Long]("share_q6")))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 2L, 500000L, 200000L),
      (2L, 2L, 4L, 10L, 1000000L, 1000000L)))
  }

  test("perfect equality: the curve is the diagonal (share == pop at every point)") {
    val df = (1L to 20L).map(i => (i, 5L)).toDF("id", "v")
    val got = Lorenz.curve(df, "v", "id", k = 5).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("share_q6") == r.getAs[Long]("pop_q6"))
    }
  }

  test("extreme concentration: one whale holds everything") {
    val df = ((1L to 9L).map(i => (i, 0L)) :+ ((10L, 100L))).toDF("id", "v")
    val got = Lorenz.curve(df, "v", "id", k = 10).orderBy("bucket").collect()
    // buckets 1..9 hold zero share; bucket 10 closes at full scale
    assert(got.take(9).forall(_.getAs[Long]("share_q6") == 0L))
    assert(got.last.getAs[Long]("share_q6") == 1000000L)
  }

  test("zero total: shares NULL, populations still real; NULL rows drop") {
    val df = Seq((Some(1L), Some(0L)), (Some(2L), Some(0L)),
      (Option.empty[Long], Some(5L)), (Some(3L), Option.empty[Long]))
      .toDF("id", "v")
    val got = Lorenz.curve(df, "v", "id", k = 2).orderBy("bucket").collect()
    assert(got.map(_.getAs[Long]("n")).sum == 2L)
    assert(got.forall(_.isNullAt(got.head.fieldIndex("share_q6"))))
    assert(got.last.getAs[Long]("pop_q6") == 1000000L)
  }
}
