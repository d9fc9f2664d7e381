package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Linkage-key contracts: normalization, digits, skeleton collisions for
  * spelling variants, prefix keys, NULL pass-through.
  */
class LinkageKeysSpec extends SparkSpec {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, v: String): String =
    Seq(Tuple1(v)).toDF("x").select(c.as("r")).collect().head.getString(0)

  test("normName: case, punctuation, spacing") {
    assert(one(LinkageKeys.normName(col("x")), "  O'Brien,   JOHN  Jr. ") == "o brien john jr")
    assert(one(LinkageKeys.normName(col("x")), "ACME-Corp.#1") == "acme corp 1")
  }

  test("digitsOnly: phone formats collide") {
    assert(one(LinkageKeys.digitsOnly(col("x")), "+1 (555) 010-9999") == "15550109999")
    assert(one(LinkageKeys.digitsOnly(col("x")), "no digits") == "")
  }

  test("skeleton: spelling variants block together; word-initials kept") {
    val sk = LinkageKeys.skeleton(col("x"))
    assert(one(sk, "Smith") == one(sk, "Smyth"))
    assert(one(sk, "jon smith") == "jn smth")
    assert(one(sk, "john smith") == "jhn smth")
    assert(one(sk, "anna") == "ann") // word-initial vowel survives
  }

  test("prefixKey on the normalized form") {
    assert(one(LinkageKeys.prefixKey(col("x"), 4), "SMITH, John") == "smit")
  }

  test("NULL rides through as NULL") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("x")
      .select(LinkageKeys.skeleton(col("x")).as("r")).collect().head
    assert(r.isNullAt(0))
  }
}
