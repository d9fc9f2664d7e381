package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table digest: order/partition invariance, change sensitivity, the
  * XOR-cancellation case sum catches, NULL sentinel, empty table.
  */
class TableDigestSpec extends SparkSpec {

  import spark.implicits._

  private def dig(df: org.apache.spark.sql.DataFrame) = {
    val r = TableDigest.digest(df).collect().head
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("row order and partitioning never change the digest") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val base = dig(df)
    assert(dig(df.orderBy(col("v").desc)) == base)
    assert(dig(df.repartition(7)) == base)
  }

  test("any cell change moves the digest; duplicates distinguishable via sum") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val base = dig(df)
    assert(dig(Seq((1L, "a"), (2L, "B")).toDF("id", "v")) != base)
    // an even number of identical rows cancels in XOR — the sum digest
    // (and the count) still distinguish
    val dup2 = Seq((1L, "a"), (1L, "a")).toDF("id", "v")
    val dup4 = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "a")).toDF("id", "v")
    val (n2, x2, s2) = dig(dup2)
    val (n4, x4, s4) = dig(dup4)
    assert(x2 == 0L && x4 == 0L, "identical pairs must cancel in XOR")
    assert(n2 != n4 && s2 != s4, "count+sum must still distinguish")
  }

  test("NULL is not the string 'null': the sentinel separates them") {
    val withNull = Seq((1L, Option.empty[String])).toDF("id", "v")
    val withWord = Seq((1L, Option("null"))).toDF("id", "v")
    assert(dig(withNull) != dig(withWord))
  }

  test("column order is part of the identity; empty table digests to zeros") {
    val df = Seq(("a", "b")).toDF("x", "y")
    assert(dig(df) != dig(df.select(col("y"), col("x"))))
    val (n, x, s) = dig(df.limit(0))
    assert(n == 0L && x == 0L && s == "0")
  }

  test("separator injection can't collide: length-prefixed fields (r10 review fix)") {
    val a = Seq(("a\u001Fb", "c")).toDF("x", "y")
    val b = Seq(("a", "b\u001Fc")).toDF("x", "y")
    assert(dig(a) != dig(b), "field boundaries must be content-proof")
    // and a literal value spelling the old sentinel is not NULL
    val mark = Seq((1L, Option("N"))).toDF("id", "v")
    val nul = Seq((1L, Option.empty[String])).toDF("id", "v")
    assert(dig(mark) != dig(nul))
  }
}
