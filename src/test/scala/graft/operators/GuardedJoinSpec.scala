package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join guard: pass-through equivalence, the exact budget math, the raise
  * with attributed keys, and null-key behavior.
  */
class GuardedJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
    .toDF("k", "lv")
  private def right = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w"))
    .toDF("k", "rv")

  test("within budget: result equals the plain inner join") {
    // key 1: 2×3 = 6, key 2: 1×1 = 1 → exactly 7 rows
    val got = GuardedJoin.inner(left, right, Seq("k"), maxOutputRows = 7)
    assert(got.count() === 7L)
    val plain = left.join(right, Seq("k"))
    assert(got.collect().toSet === plain.collect().toSet)
  }

  test("budget exceeded raises with the worst keys attributed") {
    val e = intercept[GuardedJoin.JoinBudgetExceeded] {
      GuardedJoin.inner(left, right, Seq("k"), maxOutputRows = 6)
    }
    assert(e.getMessage.contains("7 rows"))
    assert(e.getMessage.contains("(1)→6")) // key 1 contributes 6
  }

  test("keys absent from one side contribute nothing") {
    // key 3 exists only on the left — inner join drops it, and so must
    // the estimate (budget 7 still passes)
    val got = GuardedJoin.inner(left, right, Seq("k"), maxOutputRows = 7)
    assert(!got.select("k").as[Long].collect().contains(3L))
  }

  test("multi-column keys") {
    val l = Seq((1L, "p", 10), (1L, "q", 20)).toDF("a", "b", "v")
    val r = Seq((1L, "p", 30), (1L, "p", 40)).toDF("a", "b", "w")
    // (1,p): 1×2 = 2
    assert(GuardedJoin.inner(l, r, Seq("a", "b"), 2).count() === 2L)
    intercept[GuardedJoin.JoinBudgetExceeded] {
      GuardedJoin.inner(l, r, Seq("a", "b"), 1)
    }
  }

  test("empty overlap: zero estimated rows always passes") {
    val r2 = Seq((9L, "x")).toDF("k", "rv")
    assert(GuardedJoin.inner(left, r2, Seq("k"), 1).count() === 0L)
  }
}
