package graft.operators

import graft.SparkSpec

/** Ledger: hand balance trace with a recovered overdraft, same-tick
  * id-order determinism, the dup raise, double-entry violations only,
  * NULL strata.
  */
class LedgerSpec extends SparkSpec {

  import spark.implicits._

  test("running balance: first overdraft reports even after recovery") {
    val df = Seq(("a", 1L, 1L, 100L), ("a", 2L, 2L, -150L),
      ("a", 3L, 3L, 200L), ("a", 4L, 4L, -20L))
      .toDF("acct", "i", "id", "amt")
    val r = Ledger.runningBalance(df, "acct", "i", "id", "amt").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 130L)
    assert(r.getLong(3) == -50L)
    assert(r.getLong(4) == 2L) // the posting that broke it
  }

  test("an account that never goes negative reports NULL overdraft") {
    val df = Seq(("a", 1L, 1L, 5L), ("a", 2L, 2L, -3L))
      .toDF("acct", "i", "id", "amt")
    val r = Ledger.runningBalance(df, "acct", "i", "id", "amt").head()
    assert(r.getLong(3) == 2L && r.isNullAt(4))
  }

  test("same-tick postings drain in id order (deterministic)") {
    // at i=1: id 1 withdraws into overdraft BEFORE id 2 deposits
    val df = Seq(("a", 1L, 1L, -10L), ("a", 1L, 2L, 50L))
      .toDF("acct", "i", "id", "amt")
    val r = Ledger.runningBalance(df, "acct", "i", "id", "amt").head()
    assert(r.getLong(3) == -10L && r.getLong(4) == 1L)
  }

  test("duplicate (idx, id) raises in-plan") {
    val df = Seq(("a", 1L, 1L, 5L), ("a", 1L, 1L, 7L))
      .toDF("acct", "i", "id", "amt")
    val e = intercept[Exception] {
      Ledger.runningBalance(df, "acct", "i", "id", "amt").collect()
    }
    assert(e.getMessage.contains("duplicate (idx, id)"))
  }

  test("double entry reports only violations with their imbalance") {
    val df = Seq((1L, 100L), (1L, -100L), (2L, 50L), (2L, -49L),
      (3L, 10L), (3L, -5L), (3L, -5L)).toDF("txn", "amt")
    val got = Ledger.doubleEntry(df, "txn", "amt").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> ((2L, 1L))))
  }

  test("NULL accounts are real strata") {
    val df = Seq((Some("a"), 1L, 1L, 5L), (None, 1L, 2L, -7L))
      .toDF("acct", "i", "id", "amt")
    val got = Ledger.runningBalance(df, "acct", "i", "id", "amt").collect()
    assert(got.length == 2)
    assert(got.find(_.isNullAt(0)).get.getLong(4) == 2L)
  }
}
