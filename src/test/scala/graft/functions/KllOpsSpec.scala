package graft.functions

/** KLL buffer resumption: rehydrating a stored summary into a fresh
  * buffer preserves the compaction parities, so a resumed fold compacts
  * exactly as the original buffer would have (the quantile store's
  * lossless-rehydration contract).
  */
class KllOpsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("rehydration into an empty buffer adopts the stored parities") {
    val cap = 8 // k = 4
    val buf = KllOps.zero
    // enough values to force an ODD number of level-0 compactions
    (1L to 9L).foreach(v => KllOps.reduce(buf, v, cap))
    assert(buf.parities.exists(identity), "fixture must have a flipped parity")
    val resumed = KllOps.merge(KllOps.zero, KllOps.fromSummary(KllOps.toSummary(buf)), cap)
    assert(resumed.parities.toSeq === buf.parities.toSeq)
    assert(resumed.levels.map(_.sorted.toSeq).toSeq === buf.levels.map(_.sorted.toSeq).toSeq)
  }

  test("an empty-but-touched level keeps its flipped parity across merge") {
    val cap = 8
    // 8 values compact level 0 CLEANLY to empty (even count, no odd
    // carry) — its flipped parity is live state, not an untouched level
    val a = KllOps.zero
    (1L to 8L).foreach(v => KllOps.reduce(a, v, cap))
    assert(a.levels(0).isEmpty && a.parities(0) && a.touched(0))
    val b = KllOps.zero
    (101L to 103L).foreach(v => KllOps.reduce(b, v, cap))
    assert(!b.parities(0))
    val merged = KllOps.merge(a, b, cap)
    assert(merged.parities(0), "clean-compaction parity must survive the merge")
    // and the merge equals one continuous aggregation of the same stream
    val cont = KllOps.zero
    (1L to 8L).foreach(v => KllOps.reduce(cont, v, cap))
    (101L to 103L).foreach(v => KllOps.reduce(cont, v, cap))
    assert(merged.parities.toSeq === cont.parities.toSeq)
    assert(merged.levels.map(_.sorted.toSeq).toSeq === cont.levels.map(_.sorted.toSeq).toSeq)
  }

  test("resumed fold equals the uninterrupted fold, compactions included") {
    val cap = 8
    val direct = KllOps.zero
    (1L to 40L).foreach(v => KllOps.reduce(direct, v, cap))
    // same stream with a serialize/rehydrate round-trip in the middle
    val first = KllOps.zero
    (1L to 17L).foreach(v => KllOps.reduce(first, v, cap))
    val resumed = KllOps.merge(KllOps.zero, KllOps.fromSummary(KllOps.toSummary(first)), cap)
    (18L to 40L).foreach(v => KllOps.reduce(resumed, v, cap))
    assert(KllOps.quantiles(resumed, Seq((1L, 2L), (9L, 10L)))
      === KllOps.quantiles(direct, Seq((1L, 2L), (9L, 10L))))
    assert(resumed.parities.toSeq === direct.parities.toSeq)
  }
}
