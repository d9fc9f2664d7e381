package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Dynamic scalar value for the serializable query ADT.
  *
  * Mirrors the reference's dynamic scalar surface (see
  * fabrix-core/src/value.rs:128-151 — 18 typed variants + Null) but is NOT a
  * runtime cell representation: Spark rows stay in Tungsten format end to end.
  * FxValue only appears at the ADT / wire boundary (filter literals, JSON wire
  * codec, row-ingestion edges), so there is no per-cell boxing in the hot path.
  */
sealed trait FxValue {
  def fxType: FxType

  /** Spark literal Column for this value (used by the ADT translator). */
  def toLit: Column = this match {
    case FxNull            => lit(null)
    case FxBool(v)         => lit(v)
    case FxI8(v)           => lit(v)
    case FxI16(v)          => lit(v)
    case FxI32(v)          => lit(v)
    case FxI64(v)          => lit(v)
    case FxU8(v)           => lit(v.toShort)
    case FxU16(v)          => lit(v.toInt)
    case FxU32(v)          => lit(v.toLong)
    case FxU64(v)          => lit(new java.math.BigDecimal(v.underlying))
    case FxF32(v)          => lit(v)
    case FxF64(v)          => lit(v)
    case FxString(v)       => lit(v)
    case FxDate(days)      => lit(java.time.LocalDate.ofEpochDay(days.toLong))
    case FxTime(nanos)     => lit(nanos) // nanos-of-day carried as long (no TIME type pre-ANSI)
    case FxDateTime(nanos) => lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(nanos, 1000000000L), Math.floorMod(nanos, 1000000000L).toInt,
      java.time.ZoneOffset.UTC))
    case FxDecimal(v)      => lit(v.underlying())
    case FxUuid(v)         => lit(v.toString)
    case FxBytes(v)        => lit(v)
  }
}

case object FxNull                           extends FxValue { def fxType = FxType.TNull }
final case class FxBool(v: Boolean)          extends FxValue { def fxType = FxType.TBool }
final case class FxI8(v: Byte)               extends FxValue { def fxType = FxType.TI8 }
final case class FxI16(v: Short)             extends FxValue { def fxType = FxType.TI16 }
final case class FxI32(v: Int)               extends FxValue { def fxType = FxType.TI32 }
final case class FxI64(v: Long)              extends FxValue { def fxType = FxType.TI64 }
final case class FxU8(v: Short)              extends FxValue { def fxType = FxType.TU8 }
final case class FxU16(v: Int)               extends FxValue { def fxType = FxType.TU16 }
final case class FxU32(v: Long)              extends FxValue { def fxType = FxType.TU32 }
final case class FxU64(v: BigInt)            extends FxValue { def fxType = FxType.TU64 }
final case class FxF32(v: Float)             extends FxValue { def fxType = FxType.TF32 }
final case class FxF64(v: Double)            extends FxValue { def fxType = FxType.TF64 }
final case class FxString(v: String)         extends FxValue { def fxType = FxType.TString }
/** days since 1970-01-01 (same physical meaning as the reference's Date). */
final case class FxDate(days: Int)           extends FxValue { def fxType = FxType.TDate }
/** nanoseconds since midnight. */
final case class FxTime(nanos: Long)         extends FxValue { def fxType = FxType.TTime }
/** nanoseconds since epoch, no timezone. */
final case class FxDateTime(nanos: Long)     extends FxValue { def fxType = FxType.TDateTime }
final case class FxDecimal(v: BigDecimal)    extends FxValue { def fxType = FxType.TDecimal(v.precision, v.scale) }
final case class FxUuid(v: java.util.UUID)   extends FxValue { def fxType = FxType.TUuid }
final case class FxBytes(v: Array[Byte])     extends FxValue { def fxType = FxType.TBytes }

object FxValue {
  def apply(x: Any): FxValue = x match {
    case null                 => FxNull
    case v: FxValue           => v
    case v: Boolean           => FxBool(v)
    case v: Byte              => FxI8(v)
    case v: Short             => FxI16(v)
    case v: Int               => FxI32(v)
    case v: Long              => FxI64(v)
    case v: Float             => FxF32(v)
    case v: Double            => FxF64(v)
    case v: String            => FxString(v)
    case v: BigDecimal        => FxDecimal(v)
    case v: java.math.BigDecimal => FxDecimal(BigDecimal(v))
    case v: java.util.UUID    => FxUuid(v)
    case v: Array[Byte]       => FxBytes(v)
    case v: java.time.LocalDate => FxDate(v.toEpochDay.toInt)
    case v: java.time.LocalTime => FxTime(v.toNanoOfDay)
    case v: java.time.LocalDateTime =>
      FxDateTime(v.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + v.getNano)
    case v: java.sql.Date     => FxDate(v.toLocalDate.toEpochDay.toInt)
    case v: java.sql.Timestamp =>
      FxDateTime(v.getTime / 1000 * 1000000000L + v.getNanos)
    case other => throw new IllegalArgumentException(s"unsupported FxValue: $other")
  }
}

/** Type tags for the dynamic scalar surface (fabrix-core/src/value.rs:229-250)
  * with their Spark mapping (SURVEY §1.2). Unsigned ints widen — Spark has no
  * unsigned types; the original tag is preserved in column metadata.
  */
sealed trait FxType {
  def sparkType: DataType = this match {
    case FxType.TBool          => BooleanType
    case FxType.TI8            => ByteType
    case FxType.TI16           => ShortType
    case FxType.TI32           => IntegerType
    case FxType.TI64           => LongType
    case FxType.TU8            => ShortType
    case FxType.TU16           => IntegerType
    case FxType.TU32           => LongType
    case FxType.TU64           => DecimalType(20, 0)
    case FxType.TF32           => FloatType
    case FxType.TF64           => DoubleType
    case FxType.TString        => StringType
    case FxType.TDate          => DateType
    case FxType.TTime          => LongType // nanos-of-day + metadata {"graft.type":"time"}
    case FxType.TDateTime      => TimestampNTZType
    case FxType.TDecimal(p, s) => DecimalType(math.min(p, 38), math.min(s, 37))
    case FxType.TUuid          => StringType
    case FxType.TBytes         => BinaryType
    case FxType.TNull          => NullType
  }

  /** ANSI SQL type name (DuckDB-compatible) for the SQL renderer. */
  def sqlName: String = this match {
    case FxType.TBool          => "BOOLEAN"
    case FxType.TI8            => "TINYINT"
    case FxType.TI16           => "SMALLINT"
    case FxType.TI32           => "INTEGER"
    case FxType.TI64           => "BIGINT"
    case FxType.TU8            => "SMALLINT"
    case FxType.TU16           => "INTEGER"
    case FxType.TU32           => "BIGINT"
    case FxType.TU64           => "DECIMAL(20,0)"
    case FxType.TF32           => "FLOAT"
    case FxType.TF64           => "DOUBLE"
    case FxType.TString        => "VARCHAR"
    case FxType.TDate          => "DATE"
    case FxType.TTime          => "BIGINT"
    case FxType.TDateTime      => "TIMESTAMP"
    case FxType.TDecimal(p, s) => s"DECIMAL($p,$s)"
    case FxType.TUuid          => "VARCHAR"
    case FxType.TBytes         => "BLOB"
    case FxType.TNull          => "NULL"
  }
}

object FxType {
  case object TBool     extends FxType
  case object TI8       extends FxType
  case object TI16      extends FxType
  case object TI32      extends FxType
  case object TI64      extends FxType
  case object TU8       extends FxType
  case object TU16      extends FxType
  case object TU32      extends FxType
  case object TU64      extends FxType
  case object TF32      extends FxType
  case object TF64      extends FxType
  case object TString   extends FxType
  case object TDate     extends FxType
  case object TTime     extends FxType
  case object TDateTime extends FxType
  final case class TDecimal(precision: Int, scale: Int) extends FxType
  case object TUuid     extends FxType
  case object TBytes    extends FxType
  case object TNull     extends FxType

  /** Reverse mapping used by schema introspection and the wire codec. */
  def fromSpark(dt: DataType): FxType = dt match {
    case BooleanType       => TBool
    case ByteType          => TI8
    case ShortType         => TI16
    case IntegerType       => TI32
    case LongType          => TI64
    case FloatType         => TF32
    case DoubleType        => TF64
    case StringType        => TString
    case DateType          => TDate
    case _: TimestampNTZType.type => TDateTime
    case TimestampType     => TDateTime
    case d: DecimalType    => TDecimal(d.precision, d.scale)
    case BinaryType        => TBytes
    case NullType          => TNull
    case other => throw new IllegalArgumentException(s"no FxType for $other")
  }
}
