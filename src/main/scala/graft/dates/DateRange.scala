package graft.dates

import java.time.{LocalDate, ZoneOffset}

import DateKernel._

/** Immutable inclusive date range held as ISO "yyyy-MM-dd" strings —
  * reference `DateRange` frozen dataclass (`etlutil/date.py:238-300`).
  *
  * String bounds (rather than LocalDate) are deliberate: the reference
  * compares ranges lexicographically on ISO strings (date.py:659-666),
  * which is equivalent to date order and keeps the API JSON-friendly.
  */
final case class DateRange(dateStart: String, dateEnd: String) {

  // contains/overlaps compare lexicographically, which is only date order
  // for canonical ISO bounds — reject datetime-shaped or non-padded input
  // here (the reference normalizes in __init__, date.py:273-300; use
  // DateRange.of to normalize datetime-shaped strings).
  require(DateRange.isCanonical(dateStart) && DateRange.isCanonical(dateEnd),
    s"DateRange bounds must be canonical yyyy-MM-dd (got '$dateStart', '$dateEnd'); " +
      "use DateRange.of(...) to normalize")

  override def toString: String = s"[$dateStart → $dateEnd]"

  def asTuple: (String, String)    = (dateStart, dateEnd)
  def asList: List[String]         = List(dateStart, dateEnd)
  def asDict: Map[String, String]  = Map("date_start" -> dateStart, "date_end" -> dateEnd)

  /** reference date.py:318-319 — template with {start}/{end} placeholders. */
  def format(template: String = "{start} -> {end}"): String =
    template.replace("{start}", dateStart).replace("{end}", dateEnd)

  def toDictWithCustomKeys(keyStart: String = "starts_at", keyEnd: String = "ends_at"): Map[String, String] =
    Map(keyStart -> dateStart, keyEnd -> dateEnd)

  /** Facebook Ads time_range shape (date.py:337-348). */
  def toFbTimeRange: Map[String, String] = Map("since" -> dateStart, "until" -> dateEnd)

  /** Bing Ads CustomDateRange shape (date.py:350-376). */
  def toBingCustomDateRange: Map[String, Map[String, Int]] = {
    def dmy(s: String): Map[String, Int] = {
      val d = toDate(s)
      Map("Day" -> d.getDayOfMonth, "Month" -> d.getMonthValue, "Year" -> d.getYear)
    }
    Map("CustomDateRangeStart" -> dmy(dateStart), "CustomDateRangeEnd" -> dmy(dateEnd))
  }

  /** UTC ISO timestamps with the end bound extended +1 day
    * (inclusive→exclusive) — reference `to_timestamps` (date.py:394-468).
    */
  def toTimestamps(
      time: String = "00:00:00",
      tz: Option[String] = None,
      keyStart: String = "starts_at",
      keyEnd: String = "ends_at"): Map[String, String] = {
    val t = parseTime(time)
    Map(
      keyStart -> toUtcIso(toDate(dateStart), t, tz),
      keyEnd   -> toUtcIso(toDate(dateEnd).plusDays(1), t, tz))
  }

  /** Same as [[toTimestamps]] without the +1-day end shift (date.py:470-540). */
  def toTimestampsButSameDates(
      time: String = "00:00:00",
      tz: Option[String] = None,
      keyStart: String = "starts_at",
      keyEnd: String = "ends_at"): Map[String, String] = {
    val t = parseTime(time)
    Map(
      keyStart -> toUtcIso(toDate(dateStart), t, tz),
      keyEnd   -> toUtcIso(toDate(dateEnd), t, tz))
  }

  /** Reddit API range (date.py:378-392): +1-day-exclusive UTC timestamps. */
  def toRedditRange(tz: Option[String] = Some("UTC")): Map[String, String] =
    toTimestamps(tz = tz, keyStart = "starts_at", keyEnd = "ends_at")

  /** Reddit API range without the end-day shift (date.py:542-558). */
  def toRedditRangeButSameDates(tz: Option[String] = Some("UTC")): Map[String, String] =
    toTimestampsButSameDates(tz = tz, keyStart = "starts_at", keyEnd = "ends_at")

  /** Partition into `chunkDays`-sized inclusive sub-ranges; the last chunk
    * may be shorter (reference `split`, date.py:560-600).
    */
  def split(chunkDays: Int): List[DateRange] = {
    require(chunkDays >= 1, "chunk_days must be >= 1")
    val end = toDate(dateEnd)
    val out = List.newBuilder[DateRange]
    var cur = toDate(dateStart)
    while (!cur.isAfter(end)) {
      val chunkEnd = Seq(end, cur.plusDays(chunkDays - 1L)).min(Ordering.fromLessThan[LocalDate](_ isBefore _))
      out += DateRange(toDateIsoStr(cur), toDateIsoStr(chunkEnd))
      cur = chunkEnd.plusDays(1)
    }
    out.result()
  }

  /** Point-in-range (inclusive, lexicographic ISO compare — date.py:659-663). */
  def contains(date: String): Boolean = {
    val s = toDateIsoStr(date)
    dateStart <= s && s <= dateEnd
  }

  /** Range intersection predicate (date.py:665-666). */
  def overlaps(other: DateRange): Boolean =
    !(dateEnd < other.dateStart || dateStart > other.dateEnd)

  /** Inclusive day count (date.py:668-672). */
  def daysCount: Int =
    (toDate(dateEnd).toEpochDay - toDate(dateStart).toEpochDay).toInt + 1

  /** Grow: start back by `startDays`, end forward by `endDays` (date.py:674-678). */
  def extendByDays(startDays: Int, endDays: Int): DateRange =
    DateRange(
      toDateIsoStr(toDate(dateStart).minusDays(startDays.toLong)),
      toDateIsoStr(toDate(dateEnd).plusDays(endDays.toLong)))

  /** Translate both bounds by `days` (date.py:680-684). */
  def shiftByDays(days: Int): DateRange =
    DateRange(
      toDateIsoStr(toDate(dateStart).plusDays(days.toLong)),
      toDateIsoStr(toDate(dateEnd).plusDays(days.toLong)))

  /** Snap to Mon–Sun week bounds (date.py:686-696). */
  def extendToWeekBounds: DateRange = {
    val s = startOfWeek(toDate(dateStart))
    val e = startOfWeek(toDate(dateEnd)).plusDays(6)
    DateRange(toDateIsoStr(s), toDateIsoStr(e))
  }

  /** Snap to 1st–last-of-month bounds (date.py:698-712). */
  def extendToMonthBounds: DateRange = {
    val s = toDate(dateStart).withDayOfMonth(1)
    val e0 = toDate(dateEnd)
    val e  = e0.withDayOfMonth(e0.lengthOfMonth)
    DateRange(toDateIsoStr(s), toDateIsoStr(e))
  }
}

object DateRange {
  private val CanonicalIso = "\\d{4}-\\d{2}-\\d{2}".r
  private[dates] def isCanonical(s: String): Boolean =
    CanonicalIso.matches(s)

  /** `DateRange()` → today/today; `DateRange(d)` → d/d (date.py:273-300). */
  def apply(): DateRange = {
    val today = toDateIsoStr(LocalDate.now(ZoneOffset.UTC))
    DateRange(today, today)
  }
  def apply(single: String): DateRange = {
    val s = toDateIsoStr(single)
    DateRange(s, s)
  }
  def of(dateStart: String, dateEnd: String): DateRange =
    DateRange(toDateIsoStr(dateStart), toDateIsoStr(dateEnd))

  /** Anchor ± lookback/lookforward window (reference `around_date`,
    * date.py:602-657). Negative windows rejected.
    */
  def aroundDate(
      dateAnchor: Option[String] = None,
      daysLookback: Int = 0,
      daysLookforward: Int = 0): DateRange = {
    require(daysLookback >= 0 && daysLookforward >= 0,
      "days_lookback/days_lookforward must be >= 0")
    val anchor = dateAnchor.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    DateRange(
      toDateIsoStr(anchor.minusDays(daysLookback.toLong)),
      toDateIsoStr(anchor.plusDays(daysLookforward.toLong)))
  }

  /** Fixed month partition 1-8 / 9-16 / 17-24 / 25-end, Feb-aware
    * (reference `split_month_8_8_8_rest`, date.py:714-753).
    */
  def splitMonth888Rest(dateAnchor: Option[String] = None): List[DateRange] = {
    val anchor  = dateAnchor.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    val first   = anchor.withDayOfMonth(1)
    val lastDay = anchor.lengthOfMonth
    def r(d1: Int, d2: Int) =
      DateRange(toDateIsoStr(first.withDayOfMonth(d1)), toDateIsoStr(first.withDayOfMonth(d2)))
    List(r(1, 8), r(9, 16), r(17, 24), r(25, lastDay))
  }

  /** Calendar period at `offset` from the anchor (reference
    * `single_calendar_period`, date.py:755-776).
    */
  def singleCalendarPeriod(
      datePart: DatePart,
      offset: Int = 0,
      dateAnchor: Option[String] = None): DateRange = {
    val anchor = dateAnchor.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    val (s, e) = getRelativeDateFrame(datePart, offset, anchor)
    DateRange(s, e)
  }
}

/** Multi-range generators for ETL loops — reference `DateRanges`
  * (`etlutil/date.py:779-956`). Pure driver-side; results parameterize
  * partition-pruned Spark jobs (backfills, cohort windows).
  */
object DateRanges {

  /** N calendar-aligned periods ending at `dateEnd`, most-recent-first;
    * the first (most recent) period optionally trimmed to `dateEnd`
    * (reference date.py:807-857).
    */
  def calendarPeriods(
      datePart: DatePart = DatePart.Week,
      count: Int = 4,
      dateEnd: Option[String] = None,
      trimLastPeriod: Boolean = true): List[DateRange] = {
    val anchor    = dateEnd.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    val dateEndStr = toDateIsoStr(anchor)
    (0 until count).toList.map { i =>
      val (s, e0) = getRelativeDateFrame(datePart, -i, anchor)
      val e = if (trimLastPeriod && e0 > dateEndStr) dateEndStr else e0
      DateRange(s, e)
    }
  }

  /** Periods for offsets `offsetStart` down to `offsetEnd` (descending),
    * always trimmed to `dateEnd` (reference date.py:859-905).
    */
  def offsetRangeBuckets(
      datePart: DatePart = DatePart.Week,
      offsetStart: Int = 0,
      offsetEnd: Int = -3,
      dateEnd: Option[String] = None): List[DateRange] = {
    val anchor     = dateEnd.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    val dateEndStr = toDateIsoStr(anchor)
    (offsetStart to offsetEnd by -1).toList.map { offset =>
      val (s, e0) = getRelativeDateFrame(datePart, offset, anchor)
      val e = if (e0 > dateEndStr) dateEndStr else e0
      DateRange(s, e)
    }
  }

  /** Split the last `totalDays` into `chunkDays` chunks, reverse-
    * chronological — the backfill driver (reference date.py:907-956).
    */
  def splitLookbackPeriod(
      totalDays: Int,
      chunkDays: Int,
      dateEnd: Option[String] = None): List[DateRange] = {
    require(chunkDays >= 1, "chunk_days must be >= 1")
    val end        = dateEnd.map(toDate).getOrElse(LocalDate.now(ZoneOffset.UTC))
    val startTotal = end.minusDays(totalDays - 1L)
    val out        = List.newBuilder[DateRange]
    var curEnd     = end
    while (!curEnd.isBefore(startTotal)) {
      val curStart = Seq(startTotal, curEnd.minusDays(chunkDays - 1L))
        .max(Ordering.fromLessThan[LocalDate](_ isBefore _))
      out += DateRange(toDateIsoStr(curStart), toDateIsoStr(curEnd))
      curEnd = curStart.minusDays(1)
    }
    out.result()
  }
}
