package graft.wire

import graft.SparkSpec
import graft.core.Fabrix
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: every wire format round-trips arbitrary frames losslessly
  * (SURVEY §5 port-strategy item (c)). Generators cover the primitive type
  * lattice, nulls, zero-row and single-column frames. Sampling is driven by
  * raw ScalaCheck Gens with a fixed seed (the scalatest-scalacheck bridge
  * artifact is not in the offline cache), so failures are reproducible.
  */
class WirePropertySpec extends SparkSpec {

  private val fieldGen: Gen[(DataType, Gen[Any])] = Gen.oneOf(
    (BooleanType, Gen.oneOf(true, false): Gen[Any]),
    (IntegerType, Gen.chooseNum(Int.MinValue, Int.MaxValue): Gen[Any]),
    (LongType, Gen.chooseNum(Long.MinValue, Long.MaxValue): Gen[Any]),
    (DoubleType, Gen.chooseNum(-1e12, 1e12): Gen[Any]),
    (StringType, Gen.alphaNumStr.map(_.take(12)): Gen[Any]),
    (DateType, Gen.chooseNum(-3000, 30000).map(d => java.time.LocalDate.ofEpochDay(d.toLong)): Gen[Any]))

  private case class Frame(schema: StructType, rows: Seq[Seq[Any]])

  private val frameGen: Gen[Frame] = for {
    nCols <- Gen.chooseNum(1, 4)
    cols <- Gen.listOfN(nCols, fieldGen)
    nRows <- Gen.chooseNum(0, 6)
    rows <- Gen.listOfN(nRows, Gen.sequence[Seq[Any], Any](
      cols.map { case (_, g) => Gen.frequency(4 -> g, 1 -> Gen.const(null)) }))
  } yield Frame(
    StructType(cols.zipWithIndex.map { case ((dt, _), i) => StructField(s"c$i", dt) }),
    rows)

  private def toFabrix(f: Frame): Fabrix = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(f.rows.map(Row.fromSeq): _*), f.schema)
    Fabrix(df)
  }

  private def canon(fx: Fabrix): (Seq[(String, DataType)], Set[Seq[Any]]) = (
    fx.df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
    fx.df.collect().map(_.toSeq).toSet)

  private def samples(n: Int): Seq[Frame] = {
    var seed = Seed(42L)
    (0 until n).map { _ =>
      val f = frameGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      f
    }
  }

  for (wt <- Seq(JsonWire.WireType.Column, JsonWire.WireType.Row, JsonWire.WireType.Dataset)) {
    test(s"$wt wire roundtrip is lossless over 25 generated frames") {
      samples(25).foreach { f =>
        // the ROW-format zero-row fallback renames columns to Column_i
        // (names live only in the values objects) — compare width there
        val fx = toFabrix(f)
        val back = JsonWire.fromJson(spark, JsonWire.toJson(fx, wt), wt)
        if (wt == JsonWire.WireType.Row && f.rows.isEmpty)
          assert(back.df.schema.length == f.schema.length)
        else {
          val (s1, r1) = canon(fx); val (s2, r2) = canon(back)
          assert(s1 == s2, s"schema for $f")
          assert(r1 == r2, s"rows for $f")
        }
      }
    }
  }
}
