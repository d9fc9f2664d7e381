package graft.operators

import graft.SparkSpec

class MccSpec extends SparkSpec {
  import spark.implicits._

  test("perfect = +1e6, perfect inverter = -1e6, chance-level = 0") {
    val perfect = Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 0L, 0L), ("g", 0L, 0L))
    assert(ModelEval.mccSigned(perfect.toDF("g", "y", "p"), "g", "y", "p")
      .head().getLong(6) == 1000000L)
    val inverted = perfect.map { case (g, y, p) => (g, y, 1L - p) }
    assert(ModelEval.mccSigned(inverted.toDF("g", "y", "p"), "g", "y", "p")
      .head().getLong(6) == -1000000L)
    // independent: p = 1 for half of each class -> d = 0
    val chance = Seq(("g", 1L, 1L), ("g", 1L, 0L), ("g", 0L, 1L), ("g", 0L, 0L))
    assert(ModelEval.mccSigned(chance.toDF("g", "y", "p"), "g", "y", "p")
      .head().getLong(6) == 0L)
  }

  test("hand confusion: mcc2 = d^2/prod exactly, and MCC rewards balance where accuracy lies") {
    // 90 TN, 5 TP, 3 FP, 2 FN: d = 5*90 - 3*2 = 444
    // prod = 8 * 7 * 93 * 92 = 479,136 -> mcc2 = 444^2*1e6/479136 = 411,419,xxx
    val rows = Seq.fill(90)(("g", 0L, 0L)) ++ Seq.fill(5)(("g", 1L, 1L)) ++
      Seq.fill(3)(("g", 0L, 1L)) ++ Seq.fill(2)(("g", 1L, 0L))
    val got = ModelEval.mccSigned(rows.toDF("g", "y", "p"), "g", "y", "p").head()
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5)) ==
      ((5L, 3L, 2L, 90L)))
    val expect = (BigInt(444) * 444 * 1000000 / (BigInt(8) * 7 * 93 * 92)).toLong
    assert(got.getLong(6) == expect)
    // the majority-class dummy has high accuracy but an UNDEFINED MCC
    val dummy = rows.map { case (g, y, _) => (g, y, 0L) }
    assert(ModelEval.mccSigned(dummy.toDF("g", "y", "p"), "g", "y", "p")
      .head().isNullAt(6))
  }

  test("contracts: non-binary raises; NULL rows drop; NULL group is a stratum") {
    val bad = Seq(("g", 3L, 1L)).toDF("g", "y", "p")
    val ex = intercept[Exception](
      ModelEval.mccSigned(bad, "g", "y", "p").collect())
    assert(ex.getMessage.contains("must be 0 or 1"))
    val mixed = Seq((Some("g"), Some(1L), Some(1L)),
      (Some("g"), Option.empty[Long], Some(1L)),
      (Option.empty[String], Some(0L), Some(0L))).toDF("g", "y", "p")
    assert(ModelEval.mccSigned(mixed, "g", "y", "p").count() == 2)
  }
}
