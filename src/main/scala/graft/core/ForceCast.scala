package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Total, never-failing cast — parity with the reference's `force_cast`
  * matrix (fabrix-core/src/value.rs:158-221): bool→num, num→num via `as`
  * (wrapping), string→num/bool/date/datetime/decimal with fall-through on
  * parse failure.
  *
  * Divergence (documented in SURVEY §1.2): the reference's dynamic `Value`
  * keeps the ORIGINAL value on parse failure; a statically-typed distributed
  * column cannot hold a string inside an int column, so failures become NULL
  * in the target type. Callers that need the keep-original behavior cast to
  * string first (string target never fails).
  *
  * Everything here compiles to codegen'd Catalyst expressions (`try_cast` /
  * `cast`) — no UDFs, stays inside whole-stage codegen at any scale.
  */
object ForceCast {

  private val integralBits: Map[DataType, Int] =
    Map(ByteType -> 8, ShortType -> 16, IntegerType -> 32, LongType -> 64)

  /** forceCast with knowledge of the source type (total). */
  def forceCast(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    // to string: every type renders (value.rs:325-349 display path)
    case (_, StringType) => c.cast(StringType)
    // bool → numeric: true=1, false=0 (value.rs:165-169)
    case (BooleanType, t: NumericType) => when(c, lit(1)).otherwise(lit(0)).cast(t)
    // integral narrowing: Rust `as` semantics = wrapping. ANSI-mode cast
    // throws on overflow, so wrap explicitly with sign-extending shifts
    // (still codegen'd, no UDF): keep low n bits, sign-extend, then cast.
    case (f, t) if integralBits.contains(f) && integralBits.contains(t) && integralBits(t) < integralBits(f) =>
      val n = integralBits(t)
      shiftright(shiftleft(c.cast(LongType), 64 - n), 64 - n).cast(t)
    // other numeric → numeric: widening is exact; float→int out-of-range
    // yields NULL via try_cast (divergence from Rust saturating `as`,
    // documented above — never throws either way)
    case (_: NumericType, _: NumericType) => c.try_cast(to)
    // string → anything: parse, NULL (not error) on failure
    case (StringType, BooleanType) =>
      // accept 1/0 like the reference (value.rs:171-176) plus true/false
      when(lower(trim(c)).isin("true", "1", "t", "yes"), lit(true))
        .when(lower(trim(c)).isin("false", "0", "f", "no"), lit(false))
        .otherwise(lit(null).cast(BooleanType))
    case (StringType, _) => c.try_cast(to)
    // date/time widening
    case (DateType, TimestampNTZType) | (DateType, TimestampType) => c.cast(to)
    case (TimestampNTZType, DateType) | (TimestampType, DateType) => c.cast(to)
    // anything else: best-effort try_cast (total: yields NULL when impossible)
    case _ => c.try_cast(to)
  }

  /** forceCast without source-type knowledge: try_cast is already total. */
  def forceCast(c: Column, to: DataType): Column = to match {
    case StringType => c.cast(StringType)
    case _          => c.try_cast(to)
  }
}
