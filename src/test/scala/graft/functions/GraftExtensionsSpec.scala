package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-surface registration of custom expressions: after registration the
  * function answers from spark.sql, matches the Column API path bit-for-bit,
  * and DESCRIBE FUNCTION shows its catalog entry.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("md5_prefix60 usable from SQL after register() and equals the Column path") {
    GraftExtensions.register(spark)
    val df = Seq("", "a", "hello world", "γειά σου").toDF("s")
    df.createOrReplaceTempView("ext_probe")
    val viaSql = spark.sql("SELECT md5_prefix60(s) AS h FROM ext_probe ORDER BY h")
      .as[Long].collect()
    val viaColumn = df.select(Md5Prefix60(col("s")).as("h")).orderBy("h")
      .as[Long].collect()
    assert(viaSql.sameElements(viaColumn))
    assert(viaSql.forall(_ >= 0L))
  }

  test("DESCRIBE FUNCTION surfaces the catalog entry") {
    GraftExtensions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED md5_prefix60")
      .as[String].collect().mkString("\n")
    assert(desc.contains("md5_prefix60"))
    assert(desc.contains("60 bits"))
  }

  test("withExtensions install path: a fresh session sees the functions without register()") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate returns the active session, so detach it first; the new
    // session shares the SparkContext but gets its OWN function registry,
    // populated only by the injected extensions — this proves injection,
    // independent of what the other tests registered on the shared session
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne prev)
      assert(s2.sql("SELECT md5_prefix60('x')").head().getLong(0) >= 0L)
      assert(s2.sql("SELECT quantized_dot(array(0.5D), array(1.0D))").head().getLong(0) === 50000000L)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("arity is enforced") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT md5_prefix60('a', 'b')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("argument"))
  }

  test("optimizer rule collapses the portable conv-chain into Md5Prefix60") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteMd5Prefix60
    try {
      // non-literal source: a literal Seq would be constant-folded into a
      // LocalRelation before extraOptimizations run, leaving nothing to match
      def src = spark.range(5).selectExpr("CAST(id AS STRING) AS s")
      val df = src.selectExpr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[Md5Prefix60])),
        s"rule did not fire:\n$optimized")
      assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Conv])))
      // and the rewrite is semantics-preserving
      val native = src.select(Md5Prefix60(col("s")).as("h")).as[Long].collect()
      assert(df.as[Long].collect().sameElements(native))
    } finally spark.experimental.extraOptimizations = prev
  }
}
