package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** compression_ratio: ordering semantics (repetitive ≪ prose ≪ random),
  * bounds, empty/null contracts, determinism, and codegen parity.
  */
class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Int =
    Seq(Tuple1(s)).toDF("t").select(CompressionRatio(col("t"))).head().getInt(0)

  test("repetitive text compresses far below natural prose; random stays near 10000") {
    val repetitive = "buy now click here " * 200
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders through a field of tall grass looking for something to eat " * 12
    val rng = new scala.util.Random(42)
    val random = Array.fill(2000)((rng.nextInt(94) + 33).toChar).mkString
    val (r1, r2, r3) = (ratio(repetitive), ratio(prose), ratio(random))
    assert(r1 < r2 && r2 < r3, s"expected $r1 < $r2 < $r3")
    assert(r1 < 1000)      // template spam: >10× compressible
    assert(r3 > 8000)      // random printable ASCII barely compresses
  }

  test("bounds: positive, and small inputs may exceed 10000 (header overhead)") {
    assert(ratio("") === 10000)
    val tiny = ratio("ab")
    assert(tiny > 0)
  }

  test("deterministic across partitionings and repeated evaluation") {
    val docs = (1 to 50).map(i => (i.toLong, s"some text $i " * (i % 7 + 1))).toDF("id", "t")
    val a = docs.coalesce(1).select($"id", CompressionRatio($"t").as("r"))
      .as[(Long, Int)].collect().toMap
    val b = docs.repartition(8).select($"id", CompressionRatio($"t").as("r"))
      .as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("null input yields null, not a crash") {
    val got = Seq(Tuple1(null: String)).toDF("t")
      .select(CompressionRatio(col("t"))).head()
    assert(got.isNullAt(0))
  }

  test("binary payloads are accepted") {
    val payload = Array.fill[Byte](1000)(7)
    val r = Seq(Tuple1(payload)).toDF("p")
      .select(CompressionRatio(col("p"))).head().getInt(0)
    assert(r < 1000) // constant bytes collapse
  }

  test("interpreted eval matches the DataFrame (codegen) path") {
    val s = "hello world " * 40
    val expr = CompressionRatio(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType))
    assert(expr.eval(null) === ratio(s))
  }
}
