package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Production 64-bit SimHash: native expression ≡ interpreted HOF chain
  * ≡ a direct driver-side recomputation; full 64-bit range actually used
  * (bit 63 reachable ⇒ negative fingerprints appear); codegen'd.
  */
class SimHash64Spec extends SparkSpec {

  test("native equals HOF chain on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bad = docs.select(
        Dedup.simhash(col("text")).as("native"),
        Dedup.simhashHof(col("text")).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(bad === 0L)
  }

  test("edge shapes: empty string, single token, repeated shingles") {
    import spark.implicits._
    val df = Seq("", "one", "a b c a b c a b c", "x y z").toDF("text")
    val got = df.select(
      Dedup.simhash(col("text")).as("native"),
      Dedup.simhashHof(col("text")).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("matches a driver-side md5 recomputation; high bits are live") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(64)
    val rows = docs.select(col("text"),
        TextFunctions.shingleSet(col("text"), 3).as("sh"),
        Dedup.simhash(col("text")).as("fp"))
      .collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val shingles = r.getSeq[String](1)
      val votes = new Array[Int](64)
      shingles.foreach { s =>
        val h = md.digest(s.getBytes("UTF-8"))
        var v = 0L
        (0 until 8).foreach(i => v = (v << 8) | (h(i) & 0xffL))
        (0 until 64).foreach(b => votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1))
      }
      var want = 0L
      (0 until 64).foreach(b => if (votes(b) > 0) want |= (1L << b))
      assert(r.getLong(2) === want, s"mismatch for text=${r.getString(0).take(40)}")
      // hash64 helper agrees with the same digest math
      shingles.headOption.foreach { s =>
        val h = md.digest(s.getBytes("UTF-8"))
        var v = 0L
        (0 until 8).foreach(i => v = (v << 8) | (h(i) & 0xffL))
        assert(SimHash64.hash64(UTF8String.fromString(s)) === v)
      }
    }
    // 64 live bits: on any real corpus slice some fingerprint has bit 63 set
    val fps = rows.map(_.getLong(2))
    assert(fps.exists(_ < 0L), "no fingerprint with bit 63 set — width not exercised")
  }

  test("stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(SimHash64(TextFunctions.shingleSet(col("text"), 3)).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen span:\n$plan")
  }
}
