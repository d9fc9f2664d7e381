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

  /** Fan a compute-heavy frame out to cluster parallelism when the
    * upstream scan produced fewer partitions than cores — the
    * optimization guide's input-skew remedy (§2.5: one unsplittable /
    * single-row-group file serializes the whole map stage; "repartition
    * immediately after the read"). Callers apply this AFTER projecting
    * down to the columns the expensive per-row work needs, so the
    * round-robin exchange moves narrow rows only. A no-op whenever the
    * input already carries >= defaultParallelism partitions — i.e. on
    * any at-scale layout, where the scan itself provides the
    * parallelism and an extra exchange would be pure cost.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
