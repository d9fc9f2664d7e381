package graft.operators

import graft.SparkSpec

/** Spearman: perfect monotone = 1, tie-corrected average ranks (the
  * 6Σd² shortcut would be wrong here), constant-axis NULL, NULL-row
  * drop before ranking.
  */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  test("perfect monotone association is exactly 1") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L))
      .toDF("g", "x", "y")
    val r = Spearman.correlation(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[java.math.BigDecimal]("corr_num").longValueExact == 24L)
    assert(r.getAs[java.math.BigDecimal]("var_x").longValueExact == 24L)
    assert(r.getAs[java.math.BigDecimal]("var_y").longValueExact == 24L)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12)
  }

  test("ties take true average ranks: corr is sqrt(0.9) on the hand case") {
    // x = 1,2,2,3 -> doubled avg ranks 2,5,5,8; y = 10,30,20,40 -> 2,6,4,8
    val df = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 2L, 20L),
      ("a", 3L, 40L)).toDF("g", "x", "y")
    val r = Spearman.correlation(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[java.math.BigDecimal]("corr_num").longValueExact == 72L)
    assert(r.getAs[java.math.BigDecimal]("var_x").longValueExact == 72L)
    assert(r.getAs[java.math.BigDecimal]("var_y").longValueExact == 80L)
    assert(math.abs(r.getAs[Double]("corr") - math.sqrt(0.9)) < 1e-12)
  }

  test("constant axis: corr NULL, moments honest; NULL rows drop first") {
    val df = Seq(("a", Some(1L), Some(5L)), ("a", Some(2L), Some(5L)),
      ("a", None, Some(9L)), ("a", Some(3L), None))
      .toDF("g", "x", "y")
    val r = Spearman.correlation(df, Seq("g"), "x", "y").collect().head
    // only the two non-NULL pairs rank; y constant -> var_y = 0
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[java.math.BigDecimal]("var_y").longValueExact == 0L)
    assert(r.isNullAt(r.fieldIndex("corr")))
  }

  test("groups rank independently") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 2L), ("b", 2L, 1L))
      .toDF("g", "x", "y")
    val got = Spearman.correlation(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    assert(math.abs(got(0).getAs[Double]("corr") - 1.0) < 1e-12)
    assert(math.abs(got(1).getAs[Double]("corr") + 1.0) < 1e-12)
  }

  test("bucketWidth independence: decomposed ranks ≡ window ranks at every width") {
    val docs = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("qty", org.apache.spark.sql.functions.col("l_quantity").cast("bigint"))
      .withColumn("cents", org.apache.spark.sql.functions.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    val want = Spearman.correlation(docs, Seq("l_returnflag"), "qty", "cents")
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    Seq((1L, 1L), (8L, 1000000L), (1000000000L, 1000000000L)).foreach {
      case (wx, wy) =>
        val got = Spearman.correlationBucketed(docs, Seq("l_returnflag"),
            "qty", "cents", wx, wy)
          .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
        assert(got == want, s"width ($wx, $wy) diverged")
    }
    // negative values: truncating-div bucketing stays monotone
    import spark.implicits._
    val neg = Seq(("a", -3L, 9L), ("a", -1L, 7L), ("a", 1L, 5L),
      ("a", 2L, 3L), ("a", -1L, 1L)).toDF("g", "x", "y")
    val w = Spearman.ranked(neg, Seq("g"), "x", "y")
      .select("x", "y", "__rx2", "__ry2").collect().map(_.toSeq).toSet
    val b = Spearman.rankedBucketed(neg, Seq("g"), "x", "y", 2L, 2L)
      .select("x", "y", "__rx2", "__ry2").collect().map(_.toSeq).toSet
    assert(b == w)
  }
}
