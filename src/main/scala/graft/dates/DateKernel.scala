package graft.dates

import java.time.format.DateTimeFormatter
import java.time.temporal.TemporalAdjusters
import java.time.{DayOfWeek, Instant, LocalDate, LocalDateTime, LocalTime, ZoneId, ZoneOffset, ZonedDateTime}

/** Calendar period granularity.
  *
  * Mirrors the reference's `DatePart` literal union
  * (`etlutil/date.py:70-74`): DAY, WEEK, MONTH, QUARTER, YEAR.
  */
sealed abstract class DatePart(val name: String)
object DatePart {
  case object Day     extends DatePart("DAY")
  case object Week    extends DatePart("WEEK")
  case object Month   extends DatePart("MONTH")
  case object Quarter extends DatePart("QUARTER")
  case object Year    extends DatePart("YEAR")

  val all: Seq[DatePart] = Seq(Day, Week, Month, Quarter, Year)

  def parse(s: String): DatePart =
    all.find(_.name == s.toUpperCase)
      .getOrElse(throw new IllegalArgumentException(
        s"date_part must be - DAY, WEEK, MONTH, QUARTER, or YEAR (got '$s')"))
}

/** Pure-Scala date/calendar kernel — zero Spark dependencies.
  *
  * Driver-side counterpart of the reference's `etlutil/date.py` free
  * functions (`to_date` date.py:30, `to_date_iso_str` date.py:40,
  * `format_year_month` date.py:45, `generate_date_array` date.py:70,
  * `get_relative_date_frame` date.py:158). These values parameterize
  * distributed jobs (partition pruning, pushdown filters); the Column
  * forms live in [[graft.functions.DateFunctions]].
  */
object DateKernel {

  private val IsoDate = DateTimeFormatter.ISO_LOCAL_DATE

  /** Normalize a date-like string to LocalDate. Accepts "yyyy-MM-dd" and
    * full ISO datetimes ("yyyy-MM-ddTHH:mm:ss[.SSS][Z/offset]"), keeping
    * the date portion — cf. reference `to_date` (date.py:30-37) which
    * accepts str | date | datetime.
    */
  def toDate(s: String): LocalDate = {
    val t = s.trim
    if (t.length == 10) LocalDate.parse(t, IsoDate)
    else {
      // datetime-shaped input: take the leading date part
      val datePart = t.takeWhile(c => c != 'T' && c != ' ')
      LocalDate.parse(datePart, IsoDate)
    }
  }

  // The DateLike union's other two members (reference date.py:27):
  // identity on LocalDate, date-part of LocalDateTime.
  def toDate(d: java.time.LocalDate): java.time.LocalDate = d
  def toDate(dt: java.time.LocalDateTime): java.time.LocalDate = dt.toLocalDate

  /** date → "yyyy-MM-dd" (reference `to_date_iso_str`, date.py:40-42). */
  def toDateIsoStr(d: LocalDate): String = d.format(IsoDate)
  def toDateIsoStr(s: String): String    = toDateIsoStr(toDate(s))
  def toDateIsoStr(dt: java.time.LocalDateTime): String = toDateIsoStr(dt.toLocalDate)

  /** date → "yyyy-MM" (reference `format_year_month`, date.py:45-67). */
  def formatYearMonth(d: LocalDate): String = f"${d.getYear}%04d-${d.getMonthValue}%02d"
  def formatYearMonth(s: String): String    = formatYearMonth(toDate(s))

  /** Step a date by `amount` units of `part`. Month/quarter/year stepping is
    * calendar-aware with end-of-month clamping (java.time matches the
    * reference's dateutil.relativedelta here — date.py:134-144).
    */
  private[dates] def step(d: LocalDate, part: DatePart, amount: Long): LocalDate = part match {
    case DatePart.Day     => d.plusDays(amount)
    case DatePart.Week    => d.plusWeeks(amount)
    case DatePart.Month   => d.plusMonths(amount)
    case DatePart.Quarter => d.plusMonths(amount * 3)
    case DatePart.Year    => d.plusYears(amount)
  }

  /** BigQuery GENERATE_DATE_ARRAY semantics (reference date.py:70-155):
    * inclusive start→end; negative interval walks backward; interval==0 → [];
    * start==end → [start]; direction mismatch → []. Each element is computed
    * as `start + step*i` from the ORIGINAL start (not cumulatively), so
    * month-end clamping does not compound.
    */
  def generateDateArray(
      dateStart: LocalDate,
      dateEnd: LocalDate,
      interval: Int = 1,
      datePart: DatePart = DatePart.Day): Vector[LocalDate] = {
    if (interval == 0) return Vector.empty
    if (dateStart == dateEnd) return Vector(dateStart)
    if (interval > 0 && dateStart.isAfter(dateEnd)) return Vector.empty
    if (interval < 0 && dateStart.isBefore(dateEnd)) return Vector.empty

    val out = Vector.newBuilder[LocalDate]
    var i   = 0L
    var cur = dateStart
    var continue = true
    while (continue) {
      cur = step(dateStart, datePart, interval.toLong * i)
      if (interval > 0 && cur.isAfter(dateEnd)) continue = false
      else if (interval < 0 && cur.isBefore(dateEnd)) continue = false
      else { out += cur; i += 1 }
    }
    out.result()
  }

  def generateDateArray(dateStart: String, dateEnd: String): Vector[LocalDate] =
    generateDateArray(toDate(dateStart), toDate(dateEnd))
  def generateDateArray(dateStart: String, dateEnd: String, interval: Int, datePart: DatePart): Vector[LocalDate] =
    generateDateArray(toDate(dateStart), toDate(dateEnd), interval, datePart)

  /** First day (Monday) of the ISO week containing d. */
  private[dates] def startOfWeek(d: LocalDate): LocalDate =
    d.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))

  /** First month of d's quarter: 1, 4, 7, or 10. */
  private[dates] def quarterFirstMonth(d: LocalDate): Int = ((d.getMonthValue - 1) / 3) * 3 + 1

  /** Calendar-period boundaries with offset n — reference
    * `get_relative_date_frame` (date.py:158-235). Weeks are Mon–Sun
    * (pendulum start_of("week")); quarters computed from the first month of
    * the shifted date's quarter. Returns ISO (start, end) strings.
    */
  def getRelativeDateFrame(
      datePart: DatePart = DatePart.Month,
      n: Int = 0,
      dateFrom: LocalDate = LocalDate.now(ZoneOffset.UTC)): (String, String) = {
    val (start, end) = datePart match {
      case DatePart.Day =>
        val t = dateFrom.plusDays(n.toLong); (t, t)
      case DatePart.Week =>
        val t = dateFrom.plusWeeks(n.toLong)
        val s = startOfWeek(t); (s, s.plusDays(6))
      case DatePart.Month =>
        val t = dateFrom.plusMonths(n.toLong)
        (t.withDayOfMonth(1), t.`with`(TemporalAdjusters.lastDayOfMonth()))
      case DatePart.Quarter =>
        val t  = dateFrom.plusMonths(3L * n)
        val qm = quarterFirstMonth(t)
        val s  = LocalDate.of(t.getYear, qm, 1)
        (s, s.plusMonths(2).`with`(TemporalAdjusters.lastDayOfMonth()))
      case DatePart.Year =>
        val t = dateFrom.plusYears(n.toLong)
        (LocalDate.of(t.getYear, 1, 1), LocalDate.of(t.getYear, 12, 31))
    }
    (toDateIsoStr(start), toDateIsoStr(end))
  }

  def getRelativeDateFrame(datePart: DatePart, n: Int, dateFrom: String): (String, String) =
    getRelativeDateFrame(datePart, n, toDate(dateFrom))

  /** Local date+time in `tz` → UTC instant, formatted "…Z" ISO-8601
    * (reference `to_timestamps` kernel, date.py:394-468).
    */
  private[dates] def toUtcIso(d: LocalDate, time: LocalTime, tz: Option[String]): String = {
    val zone = tz.map(ZoneId.of).getOrElse(ZoneOffset.UTC)
    val utc  = ZonedDateTime.of(d, time, zone).withZoneSameInstant(ZoneOffset.UTC)
    utc.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))
  }

  private[dates] def parseTime(hms: String): LocalTime = {
    val parts = hms.split(":")
    LocalTime.of(parts(0).toInt, parts(1).toInt, parts(2).toInt)
  }

  /** Epoch seconds → LocalDateTime in UTC (timestamp cast family). */
  private[dates] def epochToUtc(sec: Double): LocalDateTime = {
    val nanos = math.round(sec * 1e9)
    LocalDateTime.ofInstant(Instant.ofEpochSecond(nanos / 1000000000L, nanos % 1000000000L), ZoneOffset.UTC)
  }
}
