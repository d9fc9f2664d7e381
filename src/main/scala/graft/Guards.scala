package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared argument guards — one definition of the repo-wide contracts so
  * call sites cannot drift (the AbTest "one definition for every entry
  * point" discipline, promoted to the whole library).
  */
object Guards {

  /** The Drift rule: exact-arithmetic operators take INTEGRAL value
    * columns only (scale fractional quantities to cents/millis upstream);
    * a float column's engine-dependent rendering/rounding would silently
    * diverge from any oracle, so fail loudly instead.
    */
  def requireIntegral(df: DataFrame, c: String, fn: String): Unit =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$fn needs an integral value column (scale to integer units first); " +
          s"$c is ${other.catalogString}")
    }
}
