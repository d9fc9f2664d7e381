package graft.functions

import scala.collection.mutable.ArrayBuffer

/** The KLL buffer mechanics shared by [[QuantileSketch]] (values →
  * quantiles), [[QuantileSummaryAgg]] (values → serialized summary) and
  * [[SummaryMergeAgg]] (summaries → quantiles): one definition of
  * reduce/merge/compact/finish so the three aggregators — and therefore
  * the live aggregation path and the maintained-store fold path — cannot
  * drift.
  */
private[functions] object KllOps {

  def zero: QSketchBuf =
    QSketchBuf(ArrayBuffer(new ArrayBuffer[Long]()), ArrayBuffer(false),
      ArrayBuffer(false))

  def reduce(buf: QSketchBuf, v: java.lang.Long, cap: Int): QSketchBuf = {
    if (v == null) return buf
    buf.levels(0) += v.longValue()
    buf.touched(0) = true
    if (buf.levels(0).length >= cap) compact(buf, 0, cap)
    buf
  }

  def merge(a: QSketchBuf, b: QSketchBuf, cap: Int): QSketchBuf = {
    while (a.levels.length < b.levels.length) {
      a.levels += new ArrayBuffer[Long](); a.parities += false; a.touched += false
    }
    var l = 0
    while (l < b.levels.length) {
      // where a's level has NEVER held state, adopt b's parity (and
      // touched-ness): a fresh buffer absorbing a rehydrated store summary
      // then compacts exactly as the original buffer would have (lossless
      // resumption). An empty-but-TOUCHED level is different: it compacted
      // cleanly to empty (even count, no odd carry) and its flipped parity
      // is live state — a's parity wins there, the same rule a live
      // running buffer applies to incoming partials.
      if (!a.touched(l)) {
        a.parities(l) = b.parities(l)
        a.touched(l) = b.touched(l)
      }
      if (b.levels(l).nonEmpty) a.touched(l) = true
      a.levels(l) ++= b.levels(l); l += 1
    }
    l = 0
    while (l < a.levels.length) { // cascade bottom-up
      if (a.levels(l).length >= cap) compact(a, l, cap)
      l += 1
    }
    a
  }

  /** Sort level l, promote alternate elements to level l+1 (parity
    * alternates per compaction; an odd leftover stays behind).
    */
  def compact(buf: QSketchBuf, l: Int, cap: Int): Unit = {
    if (l + 1 == buf.levels.length) {
      buf.levels += new ArrayBuffer[Long](); buf.parities += false
      buf.touched += false
    }
    buf.touched(l + 1) = true // cap >= 2 promotes at least one element
    val lvl = buf.levels(l)
    val sorted = lvl.toArray
    java.util.Arrays.sort(sorted)
    val even = sorted.length - (sorted.length & 1)
    val start = if (buf.parities(l)) 1 else 0
    buf.parities(l) = !buf.parities(l)
    val up = buf.levels(l + 1)
    var i = start
    while (i < even) { up += sorted(i); i += 2 }
    lvl.clear()
    if (even < sorted.length) lvl += sorted(even) // odd carry keeps weight 2^l
    if (up.length >= cap) compact(buf, l + 1, cap)
  }

  /** One value per requested fraction: smallest value with cumulative
    * weight ≥ ⌈num·W/den⌉ over the weighted union of levels (empty
    * input → empty).
    */
  def quantiles(buf: QSketchBuf, qs: Seq[(Long, Long)]): Seq[Long] = {
    var n = 0
    var l = 0
    while (l < buf.levels.length) { n += buf.levels(l).length; l += 1 }
    if (n == 0) return Seq.empty
    val vs = new Array[Long](n)
    val ws = new Array[Long](n)
    var i = 0
    l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach { v => vs(i) = v; ws(i) = w; i += 1 }
      l += 1
    }
    val order = (0 until n).sortBy(vs(_))
    val total = ws.sum
    qs.map { case (num, den) =>
      val r = (num * total + den - 1) / den
      var cum = 0L; var j = 0
      while (cum < r) { cum += ws(order(j)); j += 1 }
      vs(order(j - 1))
    }
  }

  /** Serialize a buffer to its portable (levels, parities) form. */
  def toSummary(buf: QSketchBuf): KllSummary =
    KllSummary(buf.levels.map(_.toSeq).toSeq, buf.parities.toSeq)

  /** Rehydrate a portable summary into a mutable buffer. Every rehydrated
    * level is touched by definition — the summary IS prior state.
    */
  def fromSummary(s: KllSummary): QSketchBuf =
    QSketchBuf(
      ArrayBuffer.from(s.levels.map(l => ArrayBuffer.from(l))),
      ArrayBuffer.from(s.parities),
      ArrayBuffer.fill(s.parities.length)(true))

  def requireValidFractions(k: Int, qs: Seq[(Long, Long)]): Unit = {
    require(k > 1, s"summary size k must be > 1, got $k")
    require(qs.nonEmpty, "at least one quantile fraction")
    qs.foreach { case (n, d) =>
      require(d > 0 && n > 0 && n <= d, s"quantile $n/$d must be a fraction in (0, 1]")
    }
  }
}

/** Portable serialized KLL summary — the store row payload: `levels(l)`
  * holds values of weight 2^l, `parities(l)` the next compaction's
  * alternation bit (carried so a fold across store generations compacts
  * exactly like one continuous aggregation).
  */
final case class KllSummary(levels: Seq[Seq[Long]], parities: Seq[Boolean])
