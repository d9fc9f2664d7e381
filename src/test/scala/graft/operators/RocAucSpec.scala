package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mann–Whitney AUC: hand tie case, perfect/coin-flip anchors,
  * one-class NULL, the 0/1 label guard, NULL drops.
  */
class RocAucSpec extends SparkSpec {

  import spark.implicits._

  test("hand case with a cross-class tie: AUC = 0.875 exactly") {
    // pos scores {3, 5}, neg {1, 3}: pairs 1 + 0.5 + 1 + 1 of 4
    val df = Seq(("a", 3L, 1L), ("a", 5L, 1L), ("a", 1L, 0L), ("a", 3L, 0L))
      .toDF("g", "s", "y")
    val r = RocAuc.auc(df, Seq("g"), "s", col("y")).collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_q6") == 875000L)
  }

  test("perfect separation 1e6; all-tied scores 0.5; reversal is symmetric") {
    val perfect = Seq(("a", 10L, 1L), ("a", 11L, 1L), ("a", 1L, 0L))
      .toDF("g", "s", "y")
    assert(RocAuc.auc(perfect, Seq("g"), "s", col("y"))
      .collect().head.getAs[Long]("auc_q6") == 1000000L)
    val tied = Seq(("a", 7L, 1L), ("a", 7L, 1L), ("a", 7L, 0L), ("a", 7L, 0L))
      .toDF("g", "s", "y")
    assert(RocAuc.auc(tied, Seq("g"), "s", col("y"))
      .collect().head.getAs[Long]("auc_q6") == 500000L)
    val reversed = Seq(("a", 10L, 0L), ("a", 11L, 0L), ("a", 1L, 1L))
      .toDF("g", "s", "y")
    assert(RocAuc.auc(reversed, Seq("g"), "s", col("y"))
      .collect().head.getAs[Long]("auc_q6") == 0L)
  }

  test("one-class groups report NULL; NULL score/label rows drop") {
    val df = Seq(
      ("pos_only", Some(1L), Some(1L)), ("pos_only", Some(2L), Some(1L)),
      ("ok", Some(2L), Some(1L)), ("ok", Some(1L), Some(0L)),
      ("ok", None, Some(1L)), ("ok", Some(9L), None))
      .toDF("g", "s", "y")
    val got = RocAuc.auc(df, Seq("g"), "s", col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          Option(r.get(r.fieldIndex("auc_q6"))))).toMap
    assert(got("pos_only")._3.isEmpty)
    assert(got("ok") == ((1L, 1L, Some(1000000L))))
  }

  test("a non-0/1 label fails the plan loudly") {
    val df = Seq(("a", 1L, 2L)).toDF("g", "s", "y")
    val ex = intercept[Exception] {
      RocAuc.auc(df, Seq("g"), "s", col("y")).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: all(t.getCause)
    assert(all(ex).exists(m => m != null && m.contains("label must be 0/1")))
  }

  test("bucketWidth independence: decomposed AUC ≡ window AUC at every width") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("qty", org.apache.spark.sql.functions.col("l_quantity").cast("bigint"))
    val lbl = (org.apache.spark.sql.functions.col("l_returnflag") === "R").cast("long")
    val want = RocAuc.auc(li, Seq("l_linestatus"), "qty", lbl)
      .orderBy("l_linestatus").collect().map(_.toSeq).toSeq
    Seq(1L, 8L, 1000000000L).foreach { w =>
      val got = RocAuc.aucBucketed(li, Seq("l_linestatus"), "qty", lbl, w)
        .orderBy("l_linestatus").collect().map(_.toSeq).toSeq
      assert(got == want, s"width $w diverged")
    }
  }
}
