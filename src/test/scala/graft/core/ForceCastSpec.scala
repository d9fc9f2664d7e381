package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** forceCast totality — the reference's force_cast never fails
  * (fabrix-core/src/value.rs:158-221); ours must never throw either, for any
  * input string and any target type.
  */
class ForceCastSpec extends SparkSpec {
  import spark.implicits._

  private val targets: Seq[DataType] = Seq(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, DateType, TimestampNTZType, DecimalType(18, 4))

  test("string → every target never throws (sampled property)") {
    val weird = Seq("", " ", "1", "-1", "1.5", "true", "FALSE", "0",
      "2020-01-02", "2020-01-02 03:04:05", "nope", "NaN", "Inf", "9" * 40,
      "null", "1e309", "-0", "０１２")
    val gen = Gen.asciiPrintableStr
    val samples = weird ++ (1 to 40).flatMap(i => gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    val df = samples.map(Option(_)).toDF("c")
    // one collect per target over all samples: throws = test failure
    targets.foreach { t =>
      df.select(ForceCast.forceCast(col("c"), StringType, t)).collect()
    }
  }

  test("string parse semantics") {
    val df = Seq("42", "x", "true", "0", "2021-03-04").toDF("c")
    val got = df.select(
      ForceCast.forceCast(col("c"), StringType, IntegerType).as("i"),
      ForceCast.forceCast(col("c"), StringType, BooleanType).as("b"),
      ForceCast.forceCast(col("c"), StringType, DateType).cast(StringType).as("d"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (Some(42), None, None),
      (None, None, None),
      (None, Some(true), None),
      (Some(0), Some(false), None),
      (None, None, Some("2021-03-04"))))
  }

  test("numeric narrowing wraps like Rust `as` (value.rs num→num)") {
    val got = Seq(300, -1, 127).toDF("c")
      .select(ForceCast.forceCast(col("c"), IntegerType, ByteType))
      .collect().map(_.getByte(0))
    assert(got.toSeq == Seq(300.toByte, (-1).toByte, 127.toByte))
  }

  test("bool → numeric is 1/0") {
    val got = Seq(true, false).toDF("c")
      .select(ForceCast.forceCast(col("c"), BooleanType, IntegerType))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(1, 0))
  }

  test("anything → string is total") {
    val df = Seq((1, 2.5, true)).toDF("a", "b", "c")
    val r = df.select(
      ForceCast.forceCast(col("a"), IntegerType, StringType),
      ForceCast.forceCast(col("b"), DoubleType, StringType),
      ForceCast.forceCast(col("c"), BooleanType, StringType)).head
    assert(r.getString(0) == "1" && r.getString(1) == "2.5" && r.getString(2) == "true")
  }
}
