package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All R Poisson-bootstrap weights of one row in ONE native call — the
  * hot loop of [[graft.operators.PoissonBoot]]: evaluating R separate
  * `md5_prefix60(concat(id, ':', r))` column chains costs R UTF8String
  * concats + R expression dispatches per row; this builds the digest
  * input bytes once (id + ':' + digits) and reuses one MessageDigest,
  * returning the R weights as an array the aggregate reads by index.
  * Bit-identical to the per-column chain ([[Md5Prefix60.hash60]] of the
  * same bytes against [[graft.operators.PoissonBoot.Thresholds]]) —
  * equivalence is spec-pinned, and the DuckDB oracle keeps replaying
  * the per-(id, r) md5 form.
  */
case class PoissonWeights(child: Expression, reps: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"poisson_weights requires a string id, got ${dt.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_weights"

  override protected def nullSafeEval(input: Any): Any =
    PoissonWeights.compute(input.asInstanceOf[UTF8String], reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PoissonWeights.compute($c, $reps)")

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}

object PoissonWeights {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The shared core: all R weights of one id, primitive longs. */
  def weightsRaw(idBytes: Array[Byte], reps: Int): Array[Long] = {
    val thresholds = graft.operators.PoissonBoot.Thresholds
    val d = md.get()
    val out = new Array[Long](reps)
    var r = 1
    while (r <= reps) {
      d.reset()
      d.update(idBytes)
      d.update(':'.toByte)
      // decimal digits of r, most significant first (r <= 64: two digits max)
      if (r >= 10) d.update(('0' + r / 10).toByte)
      d.update(('0' + r % 10).toByte)
      val h = d.digest()
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      v = v >>> 4 // the 60-bit md5 prefix (hex chars 1..15)
      var k = 0
      while (k < thresholds.length && v >= thresholds(k)) k += 1
      out(r - 1) =
        if (k < thresholds.length) k.toLong
        else graft.operators.PoissonBoot.MaxWeight
      r += 1
    }
    out
  }

  def compute(id: UTF8String, reps: Int): GenericArrayData = {
    val w = weightsRaw(id.getBytes, reps)
    val out = new Array[Any](reps)
    var i = 0
    while (i < reps) { out(i) = java.lang.Long.valueOf(w(i)); i += 1 }
    new GenericArrayData(out)
  }

  def apply(id: Column, reps: Int): Column =
    GraftBridge.column(PoissonWeights(GraftBridge.expression(id), reps))
}

/** The whole per-group bootstrap vector in ONE aggregate: buffer slot r
  * accumulates Σ w_{i,r}·x_i, so the R md5 draws of a row happen exactly
  * once however many replicate columns the caller reads (an expression
  * form gets inlined into every aggregate by projection collapse — the
  * r11 7s lesson). Merge is elementwise `addExact` (partial aggregation
  * composes); overflow raises loudly, never wraps.
  */
class PoissonBootAgg(reps: Int)
  extends org.apache.spark.sql.expressions.Aggregator[(String, Long), Array[Long], Seq[Long]] {
  require(reps >= 1 && reps <= 64, s"reps must be in [1, 64], got $reps")

  override def zero: Array[Long] = new Array[Long](reps)

  override def reduce(buf: Array[Long], in: (String, Long)): Array[Long] = {
    val w = PoissonWeights.weightsRaw(
      in._1.getBytes(java.nio.charset.StandardCharsets.UTF_8), reps)
    var r = 0
    while (r < reps) {
      buf(r) = Math.addExact(buf(r), Math.multiplyExact(w(r), in._2))
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = 0
    while (r < reps) { a(r) = Math.addExact(a(r), b(r)); r += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object PoissonBootAgg {
  import org.apache.spark.sql.functions.udaf
  /** `boot_sums(id, x)` usable inside `groupBy(...).agg(...)`. */
  def apply(reps: Int)(id: Column, x: Column): Column =
    udaf(new PoissonBootAgg(reps)).apply(id, x)
}
