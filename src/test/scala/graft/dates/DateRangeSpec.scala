package graft.dates

import org.scalatest.funsuite.AnyFunSuite

/** Port of `/root/reference/tests/test_date.py:948-1435` — DateRange
  * methods, emitters, and the DateRanges generators. Pure-kernel suite.
  */
class DateRangeSpec extends AnyFunSuite {
  import DatePart._

  private val jan = DateRange("2024-01-01", "2024-01-31")

  test("constructors: 0/1/2-arg; normalization via of()") {
    val single = DateRange("2024-03-05")
    assert(single.dateStart == "2024-03-05" && single.dateEnd == "2024-03-05")
    val today = DateRange()
    assert(today.dateStart == today.dateEnd)
    assert(DateRange.of("2024-01-05T10:00:00", "2024-02-01").dateStart == "2024-01-05")
  }

  test("non-canonical bounds rejected (lexicographic compares need yyyy-MM-dd)") {
    intercept[IllegalArgumentException] { DateRange("2024-01-05T10:00", "2024-02-01") }
    intercept[IllegalArgumentException] { DateRange("2024-1-5", "2024-02-01") }
  }

  test("conversions: tuple/list/dict/format/custom keys") {
    assert(jan.asTuple == ("2024-01-01", "2024-01-31"))
    assert(jan.asList == List("2024-01-01", "2024-01-31"))
    assert(jan.asDict == Map("date_start" -> "2024-01-01", "date_end" -> "2024-01-31"))
    assert(jan.format() == "2024-01-01 -> 2024-01-31")
    assert(jan.format("{start}..{end}") == "2024-01-01..2024-01-31")
    assert(jan.toDictWithCustomKeys("from", "to") ==
      Map("from" -> "2024-01-01", "to" -> "2024-01-31"))
  }

  test("API emitters: fb / bing / reddit") {
    assert(jan.toFbTimeRange == Map("since" -> "2024-01-01", "until" -> "2024-01-31"))
    val bing = jan.toBingCustomDateRange
    assert(bing("CustomDateRangeStart") == Map("Day" -> 1, "Month" -> 1, "Year" -> 2024))
    assert(bing("CustomDateRangeEnd") == Map("Day" -> 31, "Month" -> 1, "Year" -> 2024))
    // reddit: +1-day-exclusive UTC timestamps
    assert(jan.toRedditRange() == Map(
      "starts_at" -> "2024-01-01T00:00:00Z", "ends_at" -> "2024-02-01T00:00:00Z"))
    assert(jan.toRedditRangeButSameDates() == Map(
      "starts_at" -> "2024-01-01T00:00:00Z", "ends_at" -> "2024-01-31T00:00:00Z"))
  }

  test("to_timestamps: +1-day end, custom time, tz→UTC conversion") {
    assert(jan.toTimestamps() == Map(
      "starts_at" -> "2024-01-01T00:00:00Z", "ends_at" -> "2024-02-01T00:00:00Z"))
    assert(jan.toTimestamps(time = "12:30:00") == Map(
      "starts_at" -> "2024-01-01T12:30:00Z", "ends_at" -> "2024-02-01T12:30:00Z"))
    // New York midnight = 05:00 UTC in January (EST)
    assert(jan.toTimestamps(tz = Some("America/New_York"))("starts_at") ==
      "2024-01-01T05:00:00Z")
    assert(jan.toTimestampsButSameDates()("ends_at") == "2024-01-31T00:00:00Z")
  }

  test("split into chunks; last chunk shorter; invalid chunk raises") {
    val chunks = DateRange("2024-01-01", "2024-01-10").split(3)
    assert(chunks == List(
      DateRange("2024-01-01", "2024-01-03"),
      DateRange("2024-01-04", "2024-01-06"),
      DateRange("2024-01-07", "2024-01-09"),
      DateRange("2024-01-10", "2024-01-10")))
    assert(DateRange("2024-01-01", "2024-12-31").split(7).size == 53)
    intercept[IllegalArgumentException] { jan.split(0) }
  }

  test("contains / overlaps / days_count") {
    assert(jan.contains("2024-01-15"))
    assert(jan.contains("2024-01-01") && jan.contains("2024-01-31"))
    assert(!jan.contains("2024-02-01"))
    assert(jan.contains("2024-01-15T23:59:59")) // datetime-shaped point
    assert(jan.overlaps(DateRange("2024-01-31", "2024-02-15")))
    assert(!jan.overlaps(DateRange("2024-02-01", "2024-02-15")))
    assert(jan.daysCount == 31)
    assert(DateRange("2024-02-01", "2024-02-29").daysCount == 29)
  }

  test("extend_by_days / shift_by_days") {
    assert(jan.extendByDays(2, 3) == DateRange("2023-12-30", "2024-02-03"))
    assert(jan.shiftByDays(5) == DateRange("2024-01-06", "2024-02-05"))
    assert(jan.shiftByDays(-5) == DateRange("2023-12-27", "2024-01-26"))
  }

  test("extend_to_week_bounds / extend_to_month_bounds (Dec rollover)") {
    // 2024-01-03 is Wednesday; week = Mon 01-01 .. Sun 01-07
    assert(DateRange("2024-01-03", "2024-01-10").extendToWeekBounds ==
      DateRange("2024-01-01", "2024-01-14"))
    assert(DateRange("2024-12-15", "2024-12-31").extendToMonthBounds ==
      DateRange("2024-12-01", "2024-12-31"))
    assert(DateRange("2024-11-15", "2024-12-15").extendToMonthBounds ==
      DateRange("2024-11-01", "2024-12-31"))
  }

  test("around_date window; negatives rejected") {
    assert(DateRange.aroundDate(Some("2024-06-15"), 3, 2) ==
      DateRange("2024-06-12", "2024-06-17"))
    intercept[IllegalArgumentException] { DateRange.aroundDate(Some("2024-06-15"), -1, 0) }
  }

  test("split_month_8_8_8_rest is Feb-aware") {
    assert(DateRange.splitMonth888Rest(Some("2024-02-10")) == List(
      DateRange("2024-02-01", "2024-02-08"),
      DateRange("2024-02-09", "2024-02-16"),
      DateRange("2024-02-17", "2024-02-24"),
      DateRange("2024-02-25", "2024-02-29")))
    assert(DateRange.splitMonth888Rest(Some("2023-02-10")).last ==
      DateRange("2023-02-25", "2023-02-28"))
  }

  test("split_month_8_8_8_rest: December has no year-overflow; anchor day is irrelevant") {
    // reference test_date.py:1199-1217 — last_day via next month must not
    // overflow the year at December, and any anchor inside the month
    // yields the same chunks
    assert(DateRange.splitMonth888Rest(Some("2024-12-15"))(3) ==
      DateRange("2024-12-25", "2024-12-31"))
    assert(DateRange.splitMonth888Rest(Some("2024-03-01")) ==
      DateRange.splitMonth888Rest(Some("2024-03-31")))
  }

  test("single_calendar_period composes the frame kernel") {
    assert(DateRange.singleCalendarPeriod(Month, -1, Some("2024-06-15")) ==
      DateRange("2024-05-01", "2024-05-31"))
  }

  test("calendar_periods: most-recent-first, trim semantics") {
    val weeks = DateRanges.calendarPeriods(Week, 2, Some("2024-01-14"))
    assert(weeks == List(
      DateRange("2024-01-08", "2024-01-14"),
      DateRange("2024-01-01", "2024-01-07")))
    val months = DateRanges.calendarPeriods(Month, 2, Some("2024-02-15"))
    assert(months == List(
      DateRange("2024-02-01", "2024-02-15"), // trimmed
      DateRange("2024-01-01", "2024-01-31")))
    val noTrim = DateRanges.calendarPeriods(Month, 1, Some("2024-02-15"), trimLastPeriod = false)
    assert(noTrim == List(DateRange("2024-02-01", "2024-02-29")))
  }

  test("offset_range_buckets: descending offsets, always trimmed") {
    val r = DateRanges.offsetRangeBuckets(Week, 0, -2, Some("2024-01-14"))
    assert(r.size == 3)
    assert(r.head == DateRange("2024-01-08", "2024-01-14"))
    val trimmed = DateRanges.offsetRangeBuckets(Week, 0, -2, Some("2024-01-03"))
    assert(trimmed.head.dateEnd == "2024-01-03")
    assert(trimmed(1).dateEnd != "2024-01-03")
  }

  test("split_lookback_period: reverse-chronological 3+3+3+1") {
    val r = DateRanges.splitLookbackPeriod(10, 3, Some("2024-01-10"))
    assert(r == List(
      DateRange("2024-01-08", "2024-01-10"),
      DateRange("2024-01-05", "2024-01-07"),
      DateRange("2024-01-02", "2024-01-04"),
      DateRange("2024-01-01", "2024-01-01")))
    intercept[IllegalArgumentException] { DateRanges.splitLookbackPeriod(10, 0) }
  }
}
