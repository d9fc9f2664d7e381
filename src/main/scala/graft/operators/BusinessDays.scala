package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-day arithmetic with a DECLARED holiday calendar — the
  * SLA/settlement math ops and finance pipelines run constantly
  * ("respond within 3 business days", T+2 settlement, working-day
  * aging buckets): `businessDays` counts weekdays in the inclusive
  * [start, end] range minus declared weekday holidays;
  * `addBusinessDays` rolls a business-day date forward n weekdays.
  *
  * Spark-first shape: the holiday calendar is CONFIG, not data — it
  * enters as a literal array filtered in the SCAN stage (zero joins,
  * zero shuffle, codegen'd), the same posture as the L291 shard
  * literals; the weekday count is closed-form (5 per full week + a
  * ≤6-element remainder filter), never a per-day explode. Weekday
  * convention: 0=Monday..6=Sunday both engines ((dayofweek+5) mod 7
  * here, isodow−1 in the oracle), weekend = {5, 6}.
  *
  * Contracts: start > end raises in-plan (a negative SLA window is a
  * data bug, not −n); `addBusinessDays` requires a WEEKDAY start
  * (raise — "3 business days from Saturday" has no one answer; the
  * caller rolls to Monday first, explicitly) and n ≥ 0; holidays on
  * weekends are legitimately inert; duplicate holidays are rejected
  * at build time.
  */
object BusinessDays {

  /** 0=Monday .. 6=Sunday. */
  private def weekday(d: Column): Column = (dayofweek(d) + 5) % 7

  /** Count of business days in [start, end] inclusive, minus declared
    * weekday holidays. NULL starts/ends yield NULL.
    */
  def businessDays(start: Column, end: Column,
                   holidays: Seq[String] = Seq.empty): Column = {
    require(holidays.distinct.length == holidays.length,
      s"duplicate holidays in $holidays")
    val s = to_date(start)
    val e = to_date(end)
    val total = (datediff(e, s) + 1).cast("long")
    val guarded = when(total <= 0L,
      raise_error(concat(lit("businessDays: start "), s.cast("string"),
        lit(" after end "), e.cast("string")))
        .cast("long")).otherwise(total)
    val w0 = weekday(s)
    val fullWeeks = call_function("div", guarded, lit(7L))
    val rem = (guarded % 7L).cast("int")
    val remCount = size(filter(
      when(rem >= 1, sequence(lit(0), rem - 1))
        .otherwise(array().cast("array<int>")),
      j => (w0 + j) % 7 < 5))
    val base = fullWeeks * 5L + remCount.cast("long")
    val hol =
      if (holidays.isEmpty) lit(0L)
      else size(filter(typedlit(holidays.map(java.sql.Date.valueOf)),
        h => h >= s && h <= e && weekday(h) < 5)).cast("long")
    when(s.isNull || e.isNull, lit(null).cast("long"))
      .otherwise(base - hol)
  }

  /** The date n business days after a WEEKDAY start (weekend-only
    * calendar — holidays roll separately by contract). n must be ≥ 0.
    */
  def addBusinessDays(start: Column, n: Column): Column = {
    val s = to_date(start)
    val w0 = weekday(s)
    val nn = when(n < 0, raise_error(concat(
        lit("addBusinessDays: n must be >= 0, got "), n.cast("string")))
        .cast("long"))
      .otherwise(n.cast("long"))
    val sOk = when(w0 >= 5, raise_error(concat(
        lit("addBusinessDays: start "), s.cast("string"),
        lit(" is a weekend — roll to a business day explicitly first")))
        .cast("date"))
      .otherwise(s)
    val remN = (nn % 5L).cast("int")
    val jump = call_function("div", nn, lit(5L)).cast("int") * 7 + remN +
      when(w0 + remN >= 5, 2).otherwise(0)
    when(s.isNull || n.isNull, lit(null).cast("date"))
      .otherwise(date_add(sOk, jump))
  }

  /** DuckDB replay of [[businessDays]] over (s, e) expressions. */
  def businessDaysSql(sE: String, eE: String,
                      holidays: Seq[String] = Seq.empty): String = {
    val total = s"(CAST($eE AS DATE) - CAST($sE AS DATE) + 1)"
    val w0 = s"(isodow(CAST($sE AS DATE)) - 1)"
    val holList = holidays.map(h => s"DATE '$h'").mkString("[", ", ", "]")
    val hol =
      if (holidays.isEmpty) "0"
      else s"len(list_filter($holList, h -> h >= CAST($sE AS DATE) " +
        s"AND h <= CAST($eE AS DATE) AND isodow(h) <= 5))"
    s"""(5 * ($total // 7)
  + len(list_filter(range(0, $total % 7), j -> ($w0 + j) % 7 < 5))
  - $hol)"""
  }

  /** DuckDB replay of [[addBusinessDays]]. */
  def addBusinessDaysSql(sE: String, nE: String): String = {
    val w0 = s"(isodow(CAST($sE AS DATE)) - 1)"
    s"""(CAST($sE AS DATE) + CAST(7 * ($nE // 5) + $nE % 5
  + CASE WHEN $w0 + $nE % 5 >= 5 THEN 2 ELSE 0 END AS INTEGER))"""
  }
}
