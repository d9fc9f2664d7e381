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

  test("every registered function answers from SQL and matches its Column path") {
    GraftExtensions.register(spark)
    val probe = Seq(Tuple1("hello world of spark native functions and shingles"))
      .toDF("s")
    probe.createOrReplaceTempView("ext_all_probe")
    val shingles = graft.text.TextFunctions.shingleSet(col("s"), 3)

    val simSql = spark.sql(
      "SELECT simhash16(array_distinct(transform(sequence(1, size(split(s,' '))-2), " +
        "i -> concat_ws(' ', slice(split(s,' '), i, 3))))) FROM ext_all_probe")
      .head().getLong(0)
    val simCol = probe.select(SimHash16(shingles)).head().getLong(0)
    assert(simSql === simCol)

    val sim64Sql = spark.sql(
      "SELECT simhash64(array_distinct(transform(sequence(1, size(split(s,' '))-2), " +
        "i -> concat_ws(' ', slice(split(s,' '), i, 3))))) FROM ext_all_probe")
      .head().getLong(0)
    val sim64Col = probe.select(SimHash64(shingles)).head().getLong(0)
    assert(sim64Sql === sim64Col)

    val mhSql = spark.sql(
      "SELECT minhash_k(array_distinct(transform(sequence(1, size(split(s,' '))-2), " +
        "i -> concat_ws(' ', slice(split(s,' '), i, 3)))), 4) FROM ext_all_probe")
      .head().getSeq[Long](0)
    val mhCol = probe.select(MinHashK(shingles, 4)).head().getSeq[Long](0)
    assert(mhSql === mhCol)

    // media/audio/video/compression over literal payloads
    assert(spark.sql(
      "SELECT media_dims(unhex('89504E470D0A1A0A0000000D4948445200000280000001E0')).width")
      .head().getInt(0) === 640)
    val vm = spark.sql(
      "SELECT video_meta(unhex('0000001066747970" + "69736F6D" + "00000000'))")
      .head()
    assert(vm.isNullAt(0))
    assert(spark.sql("SELECT compression_ratio('')").head().getInt(0) === 10000)
    assert(spark.sql("SELECT compression_ratio(repeat('ab', 500)) < 2000")
      .head().getBoolean(0))
    val wav = spark.sql(
      "SELECT audio_meta(X'52494646FFFFFFFF57415645') IS NULL").head().getBoolean(0)
    assert(wav) // RIFF/WAVE with no fmt/data chunks → NULL

    val smSql = spark.sql("SELECT script_mix(s).ascii_letter FROM ext_all_probe")
      .head().getLong(0)
    val smCol = probe.select(ScriptMix(col("s")).getField("ascii_letter"))
      .head().getLong(0)
    assert(smSql === smCol)
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
