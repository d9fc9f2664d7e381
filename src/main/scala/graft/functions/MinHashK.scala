package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native k-hash MinHash signature over a shingle-string array: per shingle
  * s, `h = md5prefix60(s) % M`, then `sig[i] = min(sig[i], (h·(2i+1) +
  * (7919·i + 12345)) % P)` — the exact affine family of
  * [[graft.llm.Dedup.hashA]]/`hashB`, initialized at P. Replaces the
  * interpreted `aggregate(transform(...), minhashMerge)` HOF chain (k
  * modular updates per shingle, each a boxed expression-tree walk) with one
  * codegen'd Java loop per document — the hot loop of the minhash/LSH dedup
  * family.
  *
  * Null semantics mirror the HOF chain: null array → null; a null ELEMENT
  * is a no-op on every lane (`least` ignores null arguments), replicated
  * here by skipping null elements.
  */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_k requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_k"

  override protected def nullSafeEval(input: Any): Any =
    MinHashK.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashK.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)
}

object MinHashK {
  /** Shared constants with the Column/oracle paths (aliased, not copied). */
  val M: Long = graft.text.TextFunctions.M
  val P: Long = graft.text.TextFunctions.P

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val hv = Md5Prefix60.hash60(shingles.getUTF8String(i)) % M
        var j = 0
        while (j < k) {
          val cand = (hv * (2L * j + 1) + (7919L * j + 12345L)) % P
          if (cand < sig(j)) sig(j) = cand
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def apply(shingleArr: Column, k: Int): Column =
    GraftBridge.column(MinHashK(GraftBridge.expression(shingleArr), k))
}
