package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL: hash/register pin vs an independent md5 replay, LC-regime
  * accuracy, exact raw-branch arithmetic, NULL/float contracts.
  */
class HllDistinctSpec extends SparkSpec {

  import spark.implicits._

  /** Independent replay of the bucket/rho derivation via JDK md5. */
  private def bucketRho(v: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val rem = h & ((1L << 50) - 1)
    val rho = if (rem == 0L) 51L
      else 51L - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (h >>> 50, rho)
  }

  test("registers match an independent md5 bucket/rho replay") {
    val df = Seq(("g", "alpha"), ("g", "beta"), ("g", "alpha"))
      .toDF("grp", "v")
    val got = HllDistinct.registers(df, Seq("grp"), "v").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("m_j"))).toSet
    val want = Set("alpha", "beta").map(bucketRho)
      .groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("single value estimates exactly 1 via linear counting") {
    val df = Seq(("g", "x"), ("g", "x"), ("g", "x")).toDF("grp", "v")
    val r = HllDistinct.estimate(df, Seq("grp"), "v").head()
    assert(r.getAs[Long]("v_empty") == 1023L)
    assert(r.getAs[String]("method") == "lc")
    // floor(1024 * ln(1024/1023)) = floor(1.00049...) = 1
    assert(r.getAs[Long]("est_distinct") == 1L)
  }

  test("LC regime tracks exact cardinality within 5%") {
    val df = spark.range(500).select(lit("g").as("grp"),
      concat(lit("v"), col("id")).as("v"))
    val r = HllDistinct.estimate(df, Seq("grp"), "v").head()
    assert(r.getAs[String]("method") == "lc")
    val est = r.getAs[Long]("est_distinct")
    assert(math.abs(est - 500L) <= 25L, s"est=$est")
  }

  test("raw branch: a full register table replays the harmonic formula") {
    // all 1024 buckets at m_j = 1: S = 1024*2^50 = 2^60, so
    // est = 7213*2^81 / (2^60 * 10250790) = 7213*2^21 // 10250790 = 1475
    val regs = spark.range(1024).select(lit("g").as("grp"),
      col("id").as("bucket"), lit(1L).as("m_j"))
    val r = HllDistinct.estimateFromRegisters(regs, Seq("grp")).head()
    assert(r.getAs[Long]("v_empty") == 0L)
    assert(r.getAs[String]("method") == "raw")
    assert(r.getAs[Long]("est_distinct") ==
      (BigInt(7213) * BigInt(2).pow(21) / BigInt(10250790)).toLong)
  }

  test("NULLs drop; NULL group is a real stratum") {
    val df = Seq((Some("a"), Some("x")), (Some("a"), None),
      (Option.empty[String], Some("y"))).toDF("grp", "v")
    val got = HllDistinct.estimate(df, Seq("grp"), "v").collect()
      .map(r => (Option(r.getString(0)), r.getAs[Long]("est_distinct")))
    assert(got.toSet == Set((Some("a"), 1L), (None, 1L)))
  }

  test("float value columns are rejected loudly") {
    val df = Seq(("g", 1.5)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      HllDistinct.estimate(df, Seq("grp"), "v")
    }
    assert(e.getMessage.contains("engine-dependent"))
  }
}
