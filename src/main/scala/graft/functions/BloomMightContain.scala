package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built bloom filter of Long keys, as a
  * native expression: the filter (a bit array sized for the store's
  * cardinality — MBs for billions of keys) rides as a plan reference
  * object and each row costs a handful of hash probes inside whole-stage
  * codegen.
  *
  * The point at 100 TB: a batch row that fails the probe is DEFINITELY
  * not in the store (blooms have no false negatives), so it can skip the
  * store-verification join entirely — the join shuffle only carries the
  * bloom-positive sliver (true duplicates + fpp of the fresh rows) instead
  * of the whole batch. False positives are fine because callers verify
  * positives with an exact join; semantics stay exact.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint argument, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $f.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column form. */
  def apply(key: Column, filter: BloomFilter): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), filter))
}
