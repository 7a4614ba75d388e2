package graft.dates

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference date tables
  * (`/root/reference/tests/test_date.py:203-480` generate_date_array,
  * `:587-760` get_relative_date_frame, `:45-200` to_date/format).
  * Pure-kernel suite — no SparkSession.
  */
class DateKernelSpec extends AnyFunSuite {
  import DateKernel._
  import DatePart._

  private def d(s: String): LocalDate = LocalDate.parse(s)
  private def gda(s: String, e: String, iv: Int, p: DatePart): Seq[String] =
    generateDateArray(d(s), d(e), iv, p).map(toDateIsoStr)

  test("interval types table") {
    assert(gda("2024-01-01", "2024-01-10", 2, Day) ==
      Seq("2024-01-01", "2024-01-03", "2024-01-05", "2024-01-07", "2024-01-09"))
    assert(gda("2024-01-01", "2024-01-22", 1, Week) ==
      Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"))
    assert(gda("2024-01-01", "2024-06-01", 1, Month) ==
      Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01", "2024-05-01", "2024-06-01"))
    assert(gda("2024-01-01", "2024-12-01", 1, Quarter) ==
      Seq("2024-01-01", "2024-04-01", "2024-07-01", "2024-10-01"))
    assert(gda("2024-01-01", "2024-07-01", 2, Month) ==
      Seq("2024-01-01", "2024-03-01", "2024-05-01", "2024-07-01"))
  }

  test("edge cases: empty/single/zero-interval/invalid") {
    assert(gda("2024-01-05", "2024-01-01", 1, Day) == Seq.empty)
    assert(gda("2024-01-01", "2024-01-01", 1, Day) == Seq("2024-01-01"))
    assert(gda("2024-01-01", "2024-01-10", 0, Day) == Seq.empty)
    intercept[Exception] { toDate("invalid-date") }
  }

  test("large 30-day interval table") {
    assert(gda("2024-01-01", "2024-12-31", 30, Day) == Seq(
      "2024-01-01", "2024-01-31", "2024-03-01", "2024-03-31", "2024-04-30",
      "2024-05-30", "2024-06-29", "2024-07-29", "2024-08-28", "2024-09-27",
      "2024-10-27", "2024-11-26", "2024-12-26"))
  }

  test("negative interval tables") {
    assert(gda("2024-01-05", "2024-01-01", -1, Day) ==
      Seq("2024-01-05", "2024-01-04", "2024-01-03", "2024-01-02", "2024-01-01"))
    assert(gda("2024-01-22", "2024-01-01", -1, Week) ==
      Seq("2024-01-22", "2024-01-15", "2024-01-08", "2024-01-01"))
    assert(gda("2024-06-01", "2024-01-01", -1, Month) ==
      Seq("2024-06-01", "2024-05-01", "2024-04-01", "2024-03-01", "2024-02-01", "2024-01-01"))
    assert(gda("2024-12-01", "2024-01-01", -1, Quarter) ==
      Seq("2024-12-01", "2024-09-01", "2024-06-01", "2024-03-01"))
    assert(gda("2028-01-01", "2024-01-01", -1, Year) ==
      Seq("2028-01-01", "2027-01-01", "2026-01-01", "2025-01-01", "2024-01-01"))
    assert(gda("2024-01-10", "2024-01-01", -2, Day) ==
      Seq("2024-01-10", "2024-01-08", "2024-01-06", "2024-01-04", "2024-01-02"))
    assert(gda("2024-12-01", "2024-01-01", -2, Month) ==
      Seq("2024-12-01", "2024-10-01", "2024-08-01", "2024-06-01", "2024-04-01", "2024-02-01"))
    // negative-interval edges
    assert(gda("2024-01-01", "2024-01-01", -1, Day) == Seq("2024-01-01"))
    assert(gda("2024-01-01", "2024-01-05", -1, Day) == Seq.empty)
  }

  test("year lengths incl. leap years") {
    for ((y, n) <- Seq(2020 -> 366, 2021 -> 365, 2022 -> 365, 2023 -> 365, 2024 -> 366, 2025 -> 365)) {
      val r = gda(s"$y-01-01", s"$y-12-31", 1, Day)
      assert(r.size == n && r.head == s"$y-01-01" && r.last == s"$y-12-31", s"year $y")
    }
  }

  test("month-end stepping clamps from the ORIGINAL start (relativedelta semantics)") {
    assert(gda("2024-01-31", "2024-04-30", 1, Month) ==
      Seq("2024-01-31", "2024-02-29", "2024-03-31", "2024-04-30"))
  }

  test("relative frames: anchor 2024-06-15, offsets -1/0/+1 table") {
    val anchor = "2024-06-15"
    def f(p: DatePart, n: Int) = getRelativeDateFrame(p, n, anchor)
    assert(f(Day, 0) == ("2024-06-15", "2024-06-15"))
    assert(f(Week, 0) == ("2024-06-10", "2024-06-16")) // Mon–Sun
    assert(f(Month, 0) == ("2024-06-01", "2024-06-30"))
    assert(f(Quarter, 0) == ("2024-04-01", "2024-06-30"))
    assert(f(Year, 0) == ("2024-01-01", "2024-12-31"))
    assert(f(Day, -1) == ("2024-06-14", "2024-06-14"))
    assert(f(Week, -1) == ("2024-06-03", "2024-06-09"))
    assert(f(Month, -1) == ("2024-05-01", "2024-05-31"))
    assert(f(Quarter, -1) == ("2024-01-01", "2024-03-31"))
    assert(f(Year, -1) == ("2023-01-01", "2023-12-31"))
    assert(f(Day, 1) == ("2024-06-16", "2024-06-16"))
    assert(f(Week, 1) == ("2024-06-17", "2024-06-23"))
    assert(f(Month, 1) == ("2024-07-01", "2024-07-31"))
    assert(f(Quarter, 1) == ("2024-07-01", "2024-09-30"))
    assert(f(Year, 1) == ("2025-01-01", "2025-12-31"))
  }

  test("relative frames: multiple offsets and year boundaries") {
    val anchor = "2024-06-15"
    def f(p: DatePart, n: Int) = getRelativeDateFrame(p, n, anchor)
    assert(f(Day, -7) == ("2024-06-08", "2024-06-08"))
    assert(f(Week, -4) == ("2024-05-13", "2024-05-19"))
    assert(f(Month, -6) == ("2023-12-01", "2023-12-31"))
    assert(f(Quarter, -2) == ("2023-10-01", "2023-12-31"))
    assert(f(Year, -3) == ("2021-01-01", "2021-12-31"))
    assert(f(Day, 10) == ("2024-06-25", "2024-06-25"))
    assert(f(Week, 8) == ("2024-08-05", "2024-08-11"))
    assert(f(Month, 12) == ("2025-06-01", "2025-06-30"))
    assert(f(Quarter, 3) == ("2025-01-01", "2025-03-31"))
    assert(f(Year, 5) == ("2029-01-01", "2029-12-31"))
    assert(f(Month, 6) == ("2024-12-01", "2024-12-31"))
    assert(f(Month, 7) == ("2025-01-01", "2025-01-31"))
    assert(f(Month, -7) == ("2023-11-01", "2023-11-30"))
    // quarter transitions
    assert(f(Quarter, 2) == ("2024-10-01", "2024-12-31"))
    assert(f(Quarter, 4) == ("2025-04-01", "2025-06-30"))
    assert(f(Quarter, -4) == ("2023-04-01", "2023-06-30"))
  }

  test("leap-year February frames") {
    assert(getRelativeDateFrame(Month, 0, "2024-02-15") == ("2024-02-01", "2024-02-29"))
    assert(getRelativeDateFrame(Month, 0, "2023-02-15") == ("2023-02-01", "2023-02-28"))
  }

  test("week frames are Monday-based for every weekday") {
    for (day <- 10 to 16) {
      assert(getRelativeDateFrame(Week, 0, f"2024-06-$day%02d") == ("2024-06-10", "2024-06-16"),
        s"2024-06-$day")
    }
  }

  test("to_date handles datetime-shaped strings; iso-str is idempotent") {
    assert(toDate("2024-01-05T10:00:00") == d("2024-01-05"))
    assert(toDate("2024-01-05 10:00:00") == d("2024-01-05"))
    assert(toDateIsoStr("2024-01-05") == "2024-01-05")
    assert(formatYearMonth("2024-03-16") == "2024-03")
    assert(formatYearMonth("2024-12-31") == "2024-12")
    assert(formatYearMonth(d("0099-01-05")) == "0099-01")
  }

  test("DatePart.parse rejects unknown parts") {
    intercept[IllegalArgumentException] { DatePart.parse("FORTNIGHT") }
    assert(DatePart.parse("quarter") == Quarter)
  }
}
