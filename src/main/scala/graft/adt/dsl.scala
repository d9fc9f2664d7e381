package graft.adt

import graft.core._

/** Literal construction helpers for ADT queries. */
object V {
  def i32(v: Int): FxValue = FxI32(v)
  def i64(v: Long): FxValue = FxI64(v)
  def f64(v: Double): FxValue = FxF64(v)
  def str(v: String): FxValue = FxString(v)
  def bool(v: Boolean): FxValue = FxBool(v)
  def date(y: Int, m: Int, d: Int): FxValue =
    FxDate(java.time.LocalDate.of(y, m, d).toEpochDay.toInt)
  def dateTime(y: Int, m: Int, d: Int, h: Int = 0, mi: Int = 0, s: Int = 0): FxValue = {
    val ldt = java.time.LocalDateTime.of(y, m, d, h, mi, s)
    FxDateTime(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano)
  }
}
