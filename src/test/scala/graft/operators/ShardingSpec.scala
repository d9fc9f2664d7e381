package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rendezvous: determinism vs independent replay, minimal movement on
  * shard add, NULL routing, contracts.
  */
class ShardingSpec extends SparkSpec {

  import spark.implicits._

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("assignment matches an independent JDK-md5 argmax replay") {
    val shards = Seq("s0", "s1", "s2")
    val df = (1 to 50).map(i => Tuple1(s"k$i")).toDF("k")
    val got = Sharding.rendezvous(df, "k", shards).collect()
      .map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (k, s) =>
      val want = shards.maxBy(sh => (h60(s"$k|$sh"), sh))
      assert(s == want, s"key $k")
    }
  }

  test("adding a shard moves roughly 1/(n+1) of keys, never a reshuffle") {
    val df = (1 to 2000).map(i => Tuple1(s"key$i")).toDF("k")
    val before = (0 until 8).map(i => s"shard$i")
    val r = Sharding.movedShare(df, "k", before, before :+ "shard8").head()
    val moved = r.getAs[Long]("n_moved")
    // expectation 2000/9 = 222; a mod-9 scheme would move ~1778
    assert(moved > 150 && moved < 300, s"moved=$moved")
    // and the keys that moved all moved INTO the new shard
    val plan = Sharding.reshardPlan(df, "k", before, before :+ "shard8")
    assert(plan.where(col("moved") &&
      col("shard_after") =!= "shard8").count() == 0L)
  }

  test("NULL keys route to NULL; bad shard lists rejected") {
    val df = Seq(Some("a"), None).map(Tuple1(_)).toDF("k")
    val got = Sharding.rendezvous(df, "k", Seq("s0", "s1")).collect()
    assert(got.count(_.isNullAt(1)) == 1)
    intercept[IllegalArgumentException] {
      Sharding.rendezvous(df, "k", Seq("s0", "s0"))
    }
    intercept[IllegalArgumentException] {
      Sharding.rendezvous(df, "k", Seq.empty)
    }
  }
}
