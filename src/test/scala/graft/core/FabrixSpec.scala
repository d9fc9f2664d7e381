package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

class FabrixSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Fabrix(
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "v"), "id")

  test("setIndexTag records name and type") {
    assert(frame.indexTag.contains(IndexTag("id", LongType)))
  }

  test("takeCols keeps selection and drops stale index tag") {
    val f = frame.takeCols(Seq("name", "v"))
    assert(f.df.columns.toSeq == Seq("name", "v"))
    assert(f.indexTag.isEmpty)
    assert(frame.takeCols(Seq("id", "v")).indexTag.nonEmpty)
  }

  test("rename follows the index tag") {
    val f = frame.rename("id", "pk")
    assert(f.indexTag.contains(IndexTag("pk", LongType)))
    assert(f.df.columns.contains("pk"))
  }

  test("setColumnNames renames all and remaps tag") {
    val f = frame.setColumnNames(Seq("k", "n", "x"))
    assert(f.df.columns.toSeq == Seq("k", "n", "x"))
    assert(f.indexTag.map(_.name).contains("k"))
  }

  test("takeRows / removeRows / popupRows by index value") {
    val (hit, rest) = frame.popupRows(Seq(2L, 4L))
    assert(hit.df.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(rest.df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("popupRowsByFrame = semi/anti split (upsert primitive)") {
    val incoming = Fabrix(Seq((2L, "x", 0.0), (5L, "y", 0.0)).toDF("id", "name", "v"), "id")
    val (existing, fresh) = incoming.popupRowsByFrame(frame)
    assert(existing.df.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(fresh.df.select("id").as[Long].collect().toSeq == Seq(5L))
  }

  test("slice / head / tail in index order") {
    assert(frame.slice(1, 2).df.select("id").as[Long].collect().toSeq == Seq(2L, 3L))
    assert(frame.head(1).df.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(frame.tail(2).df.select("id").as[Long].collect().toSeq == Seq(3L, 4L))
  }

  test("vconcat unions by name") {
    val more = Fabrix(Seq((5L, "e", 50.0)).toDF("id", "name", "v"), "id")
    assert(frame.vconcat(more).df.count() == 5)
  }

  test("hconcat zips equal-height frames") {
    val right = Fabrix(Seq("p", "q", "r", "s").toDF("tag"))
    val out = frame.hconcat(right)
    assert(out.df.columns.toSeq == Seq("id", "name", "v", "tag"))
    assert(out.df.count() == 4)
    val m = out.df.select("id", "tag").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "p", 2L -> "q", 3L -> "r", 4L -> "s"))
  }

  test("hconcat pairs frames with mismatched partition layouts") {
    val right = Fabrix(Seq("p", "q", "r", "s").toDF("tag").repartition(3))
    val out = frame.hconcat(right)
    assert(out.df.count() == 4)
    // every left row pairs with exactly one right value (position order)
    assert(out.df.select("tag").as[String].collect().sorted.toSeq == Seq("p", "q", "r", "s"))
  }

  test("hconcat of different heights fails when rows are read") {
    val right = Fabrix(Seq("p", "q").toDF("tag"))
    val ex = intercept[Exception](frame.hconcat(right).df.collect())
    assert(ex.getMessage.contains("different heights"))
  }

  test("hconcat height guard survives column pruning (count and projection)") {
    val right = Fabrix(Seq("p", "q").toDF("tag"))
    // the guard is a FILTER, so even actions that prune every output column
    // (bare count) or drop the first column still execute it
    val exCount = intercept[Exception](frame.hconcat(right).df.count())
    assert(exCount.getMessage.contains("different heights"))
    val exProj = intercept[Exception](frame.hconcat(right).df.select("tag").collect())
    assert(exProj.getMessage.contains("different heights"))
  }

  test("generateIndex mints dense contiguous ids") {
    val f = Fabrix(Seq("a", "b", "c").toDF("name")).generateIndex()
    assert(f.indexTag.map(_.name).contains(Fabrix.DefaultIndexName))
    assert(f.df.select("index").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // dense + contiguous across many partitions (DenseIndex path)
    val big = Fabrix(spark.range(100).toDF("n").repartition(7)).generateIndex()
    assert(big.df.select("index").as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("global-order positional ops fail fast above the row-count guard") {
    // a 100 TB user must not invoke a single-partition sort by accident:
    // ordered generateIndex / insertRowsAt count first and refuse
    spark.conf.set(Fabrix.PositionalMaxRowsKey, "50")
    try {
      val big = Fabrix(spark.range(100).toDF("n"), "n")
      val exIdx = intercept[IllegalStateException](big.generateIndex(Seq($"n")))
      assert(exIdx.getMessage.contains(Fabrix.PositionalMaxRowsKey))
      val exIns = intercept[IllegalStateException](big.insertRowsAt(1, Seq(Seq(999L))))
      assert(exIns.getMessage.contains(Fabrix.PositionalMaxRowsKey))
      // under the limit both still work; <= 0 disables the guard entirely
      assert(Fabrix(spark.range(10).toDF("n"), "n").generateIndex(Seq($"n"))
        .df.count() == 10)
      spark.conf.set(Fabrix.PositionalMaxRowsKey, "0")
      assert(big.generateIndex(Seq($"n")).df.count() == 100)
    } finally spark.conf.unset(Fabrix.PositionalMaxRowsKey)
  }

  test("removeSlice / splitAt / popRow in index order") {
    assert(frame.removeSlice(1, 2).df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val (h, t) = frame.splitAt(3)
    assert(h.df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(t.df.select("id").as[Long].collect().sorted.toSeq == Seq(4L))
    val (rest, popped) = frame.popRow()
    assert(rest.df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(popped.df.select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("insertRowsAt splices positionally and regenerates a dense index") {
    val out = frame.insertRowsAt(1, Seq(Seq(99L, "ins1", 1.0), Seq(98L, "ins2", 2.0)))
    assert(out.indexTag.map(_.name).contains(Fabrix.DefaultIndexName))
    val rows = out.df.orderBy("index").select("index", "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq(
      (0L, 1L, "a"), (1L, 99L, "ins1"), (2L, 98L, "ins2"),
      (3L, 2L, "b"), (4L, 3L, "c"), (5L, 4L, "d")))
  }

  test("appendRows unions literal rows") {
    val f = frame.appendRows(Seq(Seq(9L, "z", 90.0)))
    assert(f.df.count() == 5)
    assert(f.takeRows(Seq(9L)).df.select("name").as[String].collect().toSeq == Seq("z"))
  }

  test("forceCastColumn is total") {
    val f = Fabrix(Seq(("1", "x"), ("nope", "y")).toDF("n", "s"))
      .forceCastColumn("n", IntegerType)
    assert(f.df.schema("n").dataType == IntegerType)
    assert(f.df.select("n").collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1), None))
  }

  test("loc is the index column's schema position") {
    assert(frame.loc == 0)
    assert(frame.setColumnNames(Seq("k", "n", "x")).rename("k", "id2").loc == 0)
    intercept[IllegalStateException](Fabrix(frame.df).loc)
  }

  test("hasNull flags per column in one pass; indexHasNull follows the tag") {
    val f = Fabrix(Seq((Some(1L), Option.empty[String]), (Some(2L), Some("b")))
      .toDF("id", "s"), "id")
    assert(f.hasNull == Seq(false, true))
    assert(f.indexHasNull.contains(false))
    val g = Fabrix(Seq((Option.empty[Long], "a")).toDF("id", "s"), "id")
    assert(g.indexHasNull.contains(true))
    assert(Fabrix(f.df).indexHasNull.isEmpty)
    // empty frame: no nulls anywhere
    assert(Fabrix(f.df.limit(0)).hasNull == Seq(false, false))
  }

  test("dropSeriesByName / dropSeriesByIdx drop and clear a stale tag") {
    val f = frame.dropSeriesByName("v")
    assert(f.df.columns.toSeq == Seq("id", "name") && f.indexTag.nonEmpty)
    val g = frame.dropSeriesByIdx(0)
    assert(g.df.columns.toSeq == Seq("name", "v") && g.indexTag.isEmpty)
    intercept[IllegalArgumentException](frame.dropSeriesByName("nope"))
  }

  test("insertSeries places the derived column at the requested position") {
    import org.apache.spark.sql.functions._
    val f = frame.insertSeries(1, "v2", col("v") * 2)
    assert(f.df.columns.toSeq == Seq("id", "v2", "name", "v"))
    assert(f.df.orderBy("id").select("v2").as[Double].collect().toSeq ==
      Seq(20.0, 40.0, 60.0, 80.0))
    intercept[IllegalArgumentException](frame.insertSeries(9, "x", col("v")))
    intercept[IllegalArgumentException](frame.insertSeries(0, "v", col("v")))
  }

  test("applySeries / applyAtIdx transform in place; index re-derivation refreshes the tag type") {
    val f = frame.applySeries("v", _ * 10)
    assert(f.df.columns.toSeq == frame.df.columns.toSeq)
    assert(f.df.orderBy("id").select("v").as[Double].collect().head == 100.0)
    val g = frame.applyAtIdx(0, _.cast(IntegerType))
    assert(g.indexTag.contains(IndexTag("id", IntegerType)))
  }

  test("iterColumn streams one column; rechunk coalesces partitions") {
    assert(frame.iterColumn("name").toSeq == Seq("a", "b", "c", "d"))
    val f = Fabrix(spark.range(100).repartition(8).toDF("id"), "id").rechunk()
    assert(f.df.rdd.getNumPartitions == 1)
    assert(f.df.count() == 100)
    intercept[IllegalArgumentException](frame.rechunk(0))
  }
}
