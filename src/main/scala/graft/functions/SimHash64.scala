package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a shingle-string array — the production-width
  * sibling of [[SimHash16]]. Per shingle, take the FULL 64-bit md5 prefix
  * (digest bytes 0..7 big-endian — a superset of [[Md5Prefix60.hash60]]'s
  * 60-bit prefix, so the hash family is unchanged), vote ±1 on each of the
  * 64 bits, set output bit b when its vote sum is positive. Bit 63 set makes
  * the fingerprint a negative Long — xor / bit_count / band-mask-after-shift
  * are all sign-agnostic, so hamming math and pigeonhole banding work
  * unchanged on the signed value.
  *
  * Cross-engine contract: DuckDB replays the hash as two 32-bit halves
  * (`CAST('0x'||substr(md5(x),1,8) AS BIGINT)` = bits 32..63,
  * `substr(...,9,8)` = bits 0..31) and assembles bit 63 by adding
  * `-9223372036854775807 - 1` — the correctness gates pin both paths.
  *
  * Null semantics mirror [[SimHash16]]: null array yields null; a null
  * element votes −1 on every bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val Bits = 64

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Full 64-bit md5 prefix: digest bytes 0..7 packed big-endian. Bits
    * 32..63 ⇔ hex chars 1..8, bits 0..31 ⇔ hex chars 9..16 — the two
    * BIGINT-safe halves the DuckDB oracle reads.
    */
  def hash64(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v
  }

  def compute(shingles: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) {
        var b = 0
        while (b < Bits) { votes(b) -= 1; b += 1 } // null elem: -1 on every bit
      } else {
        val hv = hash64(shingles.getUTF8String(i))
        var b = 0
        while (b < Bits) {
          votes(b) += (if (((hv >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def apply(shingleArr: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(shingleArr)))
}
