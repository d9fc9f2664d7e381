package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[ExactSum.sumLong]] must be a DROP-IN for `sum(cast(decimal(38,0)))`:
  * identical value on every signed-long edge case, identical null
  * semantics. The limb decomposition is exact for all longs (arithmetic
  * shift = floor division), so equality is checked, not approximated.
  */
class ExactSumSpec extends SparkSpec {

  private val Dec = "decimal(38,0)"

  private def frame(vs: Seq[(String, java.lang.Long)]) = {
    val rows = vs.map { case (g, v) => Row(g, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("g", StringType, nullable = false),
        StructField("v", LongType, nullable = true))))
  }

  private def check(vs: Seq[(String, java.lang.Long)]): Unit = {
    val df = frame(vs)
    val got = df.groupBy("g")
      .agg(ExactSum.sumLong(col("v")).as("s")).orderBy("g").collect()
    val want = df.groupBy("g")
      .agg(sum(col("v").cast(Dec)).as("s")).orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
    // schema parity too — callers depend on decimal(38,0) out
    assert(df.groupBy("g").agg(ExactSum.sumLong(col("v"))).schema(1).dataType
      == DataTypes.createDecimalType(38, 0))
  }

  test("extreme longs: MinValue, MaxValue, mixed signs") {
    check(Seq(("a", Long.MaxValue), ("a", Long.MaxValue), ("a", 1L),
      ("b", Long.MinValue), ("b", Long.MinValue),
      ("c", Long.MinValue), ("c", Long.MaxValue),
      ("d", -1L), ("d", 1L), ("d", 0L)))
  }

  test("null semantics: per-row nulls skipped, all-null group is NULL") {
    check(Seq(("a", 5L), ("a", null), ("a", -7L),
      ("b", null), ("b", null),
      ("c", 0L)))
  }

  test("global aggregate over empty frame is NULL") {
    val df = frame(Seq.empty)
    val got = df.agg(ExactSum.sumLong(col("v"))).collect()
    val want = df.agg(sum(col("v").cast(Dec))).collect()
    assert(got.toSeq == want.toSeq)
    assert(got.head.isNullAt(0))
  }

  test("random longs across partitions match the decimal sum") {
    val rnd = new scala.util.Random(42)
    val vs = (1 to 2000).map(i =>
      (s"g${i % 7}", java.lang.Long.valueOf(rnd.nextLong())))
    // full-range longs: hi limbs large, carries exercised in both limbs
    check(vs)
  }

  test("window frames: running limb sums equal running decimal sums") {
    import org.apache.spark.sql.expressions.Window
    val df = frame(Seq(("a", 3L), ("a", Long.MaxValue), ("a", -5L),
      ("b", Long.MinValue), ("b", 2L)))
      .withColumn("o", monotonically_increasing_id())
    val w = Window.partitionBy("g").orderBy("o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = df
      .withColumn("limb", ExactSum.sumLongOver(col("v"), w))
      .withColumn("dec", sum(col("v").cast(Dec)).over(w))
      .collect()
    rows.foreach(r => assert(r.getAs[Any]("limb") == r.getAs[Any]("dec")))
  }
}
