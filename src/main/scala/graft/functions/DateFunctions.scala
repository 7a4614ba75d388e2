package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.dates.{DatePart, DateRange}

/** Column-expression forms of the date/calendar operators — every function
  * here compiles to native Catalyst expressions (codegen'd, pushdown-
  * friendly); no UDFs. Driver-side scalar forms live in
  * [[graft.dates.DateKernel]].
  *
  * Reference semantics: `etlutil/date.py` (to_date_iso_str :40,
  * format_year_month :45, generate_date_array :70,
  * get_relative_date_frame :158, DateRange predicates :659-672).
  */
object DateFunctions {

  /** "yyyy-MM-dd" string form (reference `to_date_iso_str`, date.py:40). */
  def toDateIsoStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** "yyyy-MM" bucket — the canonical monthly group-by key (date.py:45). */
  def yearMonth(c: Column): Column = date_format(c, "yyyy-MM")

  /** One calendar step of `datePart` as an interval Column. */
  private def stepInterval(interval: Int, datePart: DatePart): Column = datePart match {
    case DatePart.Day     => make_dt_interval(days = lit(interval))
    case DatePart.Week    => make_dt_interval(days = lit(interval * 7))
    case DatePart.Month   => make_ym_interval(years = lit(0), months = lit(interval))
    case DatePart.Quarter => make_ym_interval(years = lit(0), months = lit(interval * 3))
    case DatePart.Year    => make_ym_interval(years = lit(interval), months = lit(0))
  }

  /** BigQuery GENERATE_DATE_ARRAY as a Column (reference date.py:70-155).
    *
    * Spark's `sequence` already walks calendar-aware month intervals and
    * negative steps, but THROWS on inconsistent direction where BQ (and the
    * reference) return an empty array (date.py:112-127), and errors on a
    * zero interval. The `when` guards reproduce BQ edge semantics while the
    * hot path stays a single native `sequence` expression — `CaseWhen`
    * evaluates branches lazily so the guarded `sequence` never sees a
    * mismatched-direction row.
    */
  def generateDateArray(
      start: Column,
      end: Column,
      interval: Int = 1,
      datePart: DatePart = DatePart.Day): Column = {
    val s = start.cast("date")
    val e = end.cast("date")
    if (interval == 0) {
      array().cast("array<date>")
    } else {
      val mismatch = if (interval > 0) s > e else s < e
      when(s.isNull || e.isNull, lit(null).cast("array<date>"))
        .when(s === e, array(s))
        .when(mismatch, array().cast("array<date>"))
        .otherwise(sequence(s, e, stepInterval(interval, datePart)))
    }
  }

  /** Truncate to the enclosing calendar period start. Spark's
    * `date_trunc('week')` is Monday-based, matching the reference's
    * pendulum `start_of("week")` (date.py:213-215).
    */
  def truncToPeriod(c: Column, datePart: DatePart): Column = {
    val unit = datePart match {
      case DatePart.Day     => "day"
      case DatePart.Week    => "week"
      case DatePart.Month   => "month"
      case DatePart.Quarter => "quarter"
      case DatePart.Year    => "year"
    }
    date_trunc(unit, c).cast("date")
  }

  /** Period end (inclusive) of the enclosing calendar period. */
  def periodEnd(c: Column, datePart: DatePart): Column = datePart match {
    case DatePart.Day     => c.cast("date")
    case DatePart.Week    => date_add(truncToPeriod(c, DatePart.Week), 6)
    case DatePart.Month   => last_day(c)
    case DatePart.Quarter => last_day(add_months(truncToPeriod(c, DatePart.Quarter), 2))
    case DatePart.Year    => last_day(add_months(truncToPeriod(c, DatePart.Year), 11))
  }

  /** Point-in-range predicate for a driver-side [[DateRange]]
    * (reference `contains`, date.py:659-663). Constant bounds make this a
    * pushdown-able BETWEEN on the scan.
    */
  def inRange(c: Column, dr: DateRange): Column =
    c.cast("date").between(lit(dr.dateStart).cast("date"), lit(dr.dateEnd).cast("date"))

  /** Range-overlap predicate between two (start, end) column pairs — the
    * interval-join predicate (reference `overlaps`, date.py:665-666).
    */
  def overlaps(start1: Column, end1: Column, start2: Column, end2: Column): Column =
    start1 <= end2 && end1 >= start2

  /** Inclusive day count between two date columns (date.py:668-672). */
  def daysCount(start: Column, end: Column): Column =
    datediff(end, start) + lit(1)
}
