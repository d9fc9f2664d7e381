package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain interleave: hand-checked round-robin, equality with the global-
  * window reference, dense-permutation property, domain exhaustion, NULL
  * exclusion, and the no-global-window plan shape.
  */
class InterleaveSpec extends SparkSpec {

  import spark.implicits._

  test("round-robin positions, hand-checked with uneven domains") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "dom")
    val got = Interleave.byDomain(d, "dom", Seq(col("id")))
      .select("id", "rank_in_domain", "interleave_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // merge order: a1 b1 a2 b2 a3 (b exhausts, a keeps going)
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 3L, 5L),
      (4L, 1L, 2L), (5L, 2L, 4L)))
  }

  test("arithmetic positions equal the global-window reference") {
    val d = (1 to 120).map(i => (i.toLong, s"dom${i % 7}")).toDF("id", "dom")
    val got = Interleave.byDomain(d, "dom", Seq(col("id")))
      .select("id", "interleave_pos").as[(Long, Long)].collect().toMap
    val rankW = Window.partitionBy("dom").orderBy("id")
    val ref = d.withColumn("rk", row_number().over(rankW))
      .withColumn("pos", row_number().over(Window.orderBy(col("rk"), col("dom")))
        .cast("long"))
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got === ref)
  }

  test("positions are a dense 1..n permutation") {
    val d = (1 to 80).map(i => (i.toLong, s"g${(i * 13) % 5}")).toDF("id", "dom")
    val pos = Interleave.byDomain(d, "dom", Seq(col("id")))
      .select("interleave_pos").as[Long].collect().sorted.toSeq
    assert(pos === (1L to 80L).toSeq)
  }

  test("NULL domains are excluded") {
    val d = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "dom")
    val ids = Interleave.byDomain(d, "dom", Seq(col("id")))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("empty input (or all rows excluded) yields an empty frame, not an error") {
    val d = Seq((1L, Option.empty[String])).toDF("id", "dom")
    assert(Interleave.byDomain(d, "dom", Seq(col("id"))).count() === 0L)
    val none = Seq.empty[(Long, String)].toDF("id", "dom")
    assert(Interleave.byDomain(none, "dom", Seq(col("id"))).count() === 0L)
  }

  test("NULL order keys are excluded (documented contract, oracle parity)") {
    val d = Seq((Option(1L), "a"), (Option.empty[Long], "a"), (Option(3L), "a"))
      .toDF("id", "dom")
    val got = Interleave.byDomain(d, "dom", Seq(col("id")))
      .select("id", "interleave_pos").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (3L, 2L)))
  }

  test("non-string domain columns are rejected") {
    val d = Seq((1L, 10L)).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      Interleave.byDomain(d, "dom", Seq(col("id")))
    }
    assert(e.getMessage.contains("string domain"))
  }

  test("domain cap is enforced") {
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      Interleave.byDomain(d, "dom", Seq(col("id")), maxDomains = 2)
    }
    assert(e.getMessage.contains("maxDomains"))
  }

  test("plan: only the per-domain rank window, no global total-order window") {
    val d = Seq((1L, "a"), (2L, "b")).toDF("id", "dom")
    val plan = Interleave.byDomain(d, "dom", Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(dom"))
    // a global row_number over (rank, dom) would appear as a second,
    // unpartitioned window spec — the position must be pure projection
    assert("windowspecdefinition\\(".r.findAllIn(plan).size
      === "windowspecdefinition\\(dom".r.findAllIn(plan).size)
  }

  test("shuffled curriculum: fingerprint order keys give a deterministic permutation") {
    import graft.text.TextFunctions.fingerprint
    val d = (1 to 40).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "dom")
    val a = Interleave.byDomain(d, "dom", Seq(fingerprint(col("id").cast("string")), col("id")))
      .select("id", "interleave_pos").as[(Long, Long)].collect().toSet
    val b = Interleave.byDomain(d.repartition(8), "dom",
        Seq(fingerprint(col("id").cast("string")), col("id")))
      .select("id", "interleave_pos").as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
