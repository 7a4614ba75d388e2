package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dates.{DateKernel, DatePart, DateRange, DateRanges}
import graft.functions.DateFunctions

/** Date/calendar operators as distributed queries.
  *
  * - generate_date_array (reference date.py:70-155) → native `sequence`
  *   with BQ edge guards, exploded to rows.
  * - get_relative_date_frame (date.py:158-235) → driver kernel; the DuckDB
  *   oracle recomputes the frames independently from date_trunc/last_day.
  * - split_lookback_period (date.py:907-956) → driver-computed range list
  *   broadcast-joined against the events fact (the reference's backfill
  *   loop, run as ONE distributed range join instead of N sequential jobs).
  *
  * Scale notes: the range list is O(#chunks) — broadcast, never shuffled;
  * the events side stays partition-local until the final tiny group-by.
  * Constant date bounds are pushdown-able to the parquet scan.
  */
object DateQueries {

  private val FrameAnchor = "2024-06-15"
  private val frameSpecs: Seq[(String, Int)] =
    for {
      part <- Seq("DAY", "WEEK", "MONTH", "QUARTER", "YEAR")
      n    <- Seq(-2, -1, 0, 1, 2)
    } yield (part, n)

  private val arraySpecs: Seq[(String, String, String, Int, DatePart)] = Seq(
    ("monthly_fwd",   "2024-01-15", "2024-12-15",  1, DatePart.Month),
    ("monthend_clamp","2023-01-31", "2023-06-30",  1, DatePart.Month),
    ("biweekly_back", "2024-03-31", "2024-01-01", -2, DatePart.Week),
    ("quarterly",     "2023-02-28", "2024-12-31",  1, DatePart.Quarter),
    ("yearly",        "2020-02-29", "2024-12-31",  1, DatePart.Year),
    ("daily_step3",   "2024-01-01", "2024-01-31",  3, DatePart.Day))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_generate_date_array" -> ((s, dir) => {
      arraySpecs.map { case (tag, start, end, iv, part) =>
        s.range(1).select(
          lit(tag).as("series"),
          explode(DateFunctions.generateDateArray(lit(start), lit(end), iv, part)).as("d"))
      }.reduce(_ unionAll _)
        .select(col("series"), date_format(col("d"), "yyyy-MM-dd").as("d"))
    }),

    "q5_relative_date_frames" -> ((s, dir) => {
      import s.implicits._
      frameSpecs.map { case (part, n) =>
        val (fs, fe) = DateKernel.getRelativeDateFrame(DatePart.parse(part), n, FrameAnchor)
        (part, n, fs, fe)
      }.toDF("date_part", "n", "frame_start", "frame_end")
    }),

    "q6_backfill_range_join" -> ((s, dir) => {
      import s.implicits._
      val rangeList = DateRanges
        .splitLookbackPeriod(totalDays = 30, chunkDays = 7, dateEnd = Some("2024-01-30"))
      // Driver-side range list → (a) a STATIC min/max pushdown predicate on
      // the fact scan (parquet row-group pruning does the heavy lifting at
      // 100 TB — without it a 30-day backfill is a full-table scan), and
      // (b) a broadcast side pre-cast to DateType ONCE, so the BNLJ
      // predicate compares dates, not per-row string casts.
      val lo = rangeList.map(_.dateStart).min
      val hiExcl = java.time.LocalDate.parse(rangeList.map(_.dateEnd).max)
        .plusDays(1).toString
      val ranges = rangeList.map(r => (r.dateStart, r.dateEnd))
        .toDF("range_start", "range_end")
        .withColumn("rs", col("range_start").cast("date"))
        .withColumn("re", col("range_end").cast("date"))
      Tables.eventsBetween(s, dir, lo, hiExcl)
        .withColumn("ts_date", col("ts").cast("date"))
        .join(broadcast(ranges), col("ts_date").between(col("rs"), col("re")))
        .groupBy(col("range_start"), col("range_end"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
    }),

    // T2/T3: ISO-string and year-month Column forms as group-by keys —
    // the canonical monthly rollup.
    "q24_yearmonth_rollup" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(DateFunctions.yearMonth(col("ts")).as("ym"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
    }),

    // T18 calendar_periods driving a period-bucketed aggregate: the
    // reference README cohort pattern run as ONE scan with a static
    // pushdown window (periods computed on the driver).
    "q25_calendar_cohorts" -> ((s, dir) => {
      import s.implicits._
      val periods = DateRanges.calendarPeriods(
        DatePart.Week, count = 4, dateEnd = Some("2024-02-25"))
      val lo = periods.map(_.dateStart).min
      val hiExcl = java.time.LocalDate.parse(periods.map(_.dateEnd).max)
        .plusDays(1).toString
      val pdf = periods.map(p => (p.dateStart, p.dateEnd))
        .toDF("period_start", "period_end")
        .withColumn("ps", col("period_start").cast("date"))
        .withColumn("pe", col("period_end").cast("date"))
      Tables.eventsBetween(s, dir, lo, hiExcl)
        .withColumn("d", col("ts").cast("date"))
        .join(broadcast(pdf), col("d").between(col("ps"), col("pe")))
        .groupBy(col("period_start"), col("period_end"))
        .agg(count(lit(1)).as("cnt"),
          count_distinct(col("user_id")).as("users"))
    }),

    // T11 split + T13 contains/daysCount Column forms: weekly backfill
    // chunks as a broadcast range join with per-chunk day counts.
    "q26_split_chunks" -> ((s, dir) => {
      import s.implicits._
      val chunks = DateRange("2024-01-01", "2024-01-30").split(7)
      val lo = chunks.map(_.dateStart).min
      val hiExcl = java.time.LocalDate.parse(chunks.map(_.dateEnd).max)
        .plusDays(1).toString
      val cdf = chunks.map(c => (c.dateStart, c.dateEnd))
        .toDF("chunk_start", "chunk_end")
        .withColumn("cs", col("chunk_start").cast("date"))
        .withColumn("ce", col("chunk_end").cast("date"))
        .withColumn("chunk_days", DateFunctions.daysCount(col("cs"), col("ce")))
      Tables.eventsBetween(s, dir, lo, hiExcl)
        .withColumn("d", col("ts").cast("date"))
        .join(broadcast(cdf), col("d").between(col("cs"), col("ce")))
        .groupBy(col("chunk_start"), col("chunk_end"), col("chunk_days"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // T6-T10: DateRange API emitters driven by real per-group min/max
    // dates (3 groups → driver-side range objects → literal output).
    "q27_timestamp_emitters" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("lo"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("hi"))
        .collect() // 3 status groups — the driver-side emitters are the operator
        .map { r =>
          val dr = DateRange(r.getString(1), r.getString(2))
          val fb = dr.toFbTimeRange
          val ts = dr.toTimestamps()
          val same = dr.toTimestampsButSameDates()
          val bing = dr.toBingCustomDateRange
          (r.getString(0), fb("since"), fb("until"),
            ts("starts_at"), ts("ends_at"), same("ends_at"),
            bing("CustomDateRangeStart")("Day"), bing("CustomDateRangeEnd")("Month"),
            dr.daysCount)
        }.toSeq
      rows.toDF("status", "fb_since", "fb_until", "ts_start", "ts_end",
        "ts_end_same", "bing_start_day", "bing_end_month", "days_count")
    }),

    // T7/T8/T12/T14-T17/T19: the remaining DateRange surface, exercised as
    // a literal-driven table (the operators are driver-side range algebra;
    // the DuckDB oracle recomputes every row independently from the INPUT
    // literals with SQL date arithmetic, never from our outputs).
    "q32_daterange_methods" -> ((s, dir) => {
      import s.implicits._
      val b = DateRange("2024-02-10", "2024-03-05")
      val t7 = Seq(
        ("as_tuple", "base", b.asTuple._1, b.asTuple._2),
        ("as_list", "base", b.asList.head, b.asList(1)),
        ("as_dict", "base", b.asDict("date_start"), b.asDict("date_end")),
        ("format", "dots", b.format("{start}..{end}"), "-"),
        ("custom_keys", "since_until",
          b.toDictWithCustomKeys("since", "until")("since"),
          b.toDictWithCustomKeys("since", "until")("until")))
      val t8 = Seq(
        ("to_reddit_range", "base",
          b.toRedditRange()("starts_at"), b.toRedditRange()("ends_at")),
        ("to_reddit_range_same", "base",
          b.toRedditRangeButSameDates()("starts_at"),
          b.toRedditRangeButSameDates()("ends_at")))
      val t12 = Seq(
        DateRange.aroundDate(Some("2024-03-15"), 10, 5) -> ("around_date", "lb10_lf5"),
        DateRange.aroundDate(Some("2024-03-15"))        -> ("around_date", "zero"))
      val t14 = Seq(
        b.extendByDays(3, 4) -> ("extend_by_days", "s3_e4"),
        b.shiftByDays(-7)    -> ("shift_by_days", "minus7"))
      val t15 = Seq(
        b.extendToWeekBounds  -> ("extend_to_week_bounds", "base"),
        b.extendToMonthBounds -> ("extend_to_month_bounds", "base"))
      val t16 = Seq("leap" -> "2024-02-15", "nonleap" -> "2023-02-10").flatMap {
        case (tag, anchor) =>
          DateRange.splitMonth888Rest(Some(anchor)).zipWithIndex.map {
            case (r, i) => r -> ("split_month_8_8_8_rest", s"${tag}_${i + 1}")
          }
      }
      val t17 = Seq(
        DateRange.singleCalendarPeriod(DatePart.Quarter, -1, Some("2024-05-20")) ->
          ("single_calendar_period", "quarter_m1"),
        DateRange.singleCalendarPeriod(DatePart.Year, 1, Some("2024-05-20")) ->
          ("single_calendar_period", "year_p1"))
      val t19 =
        DateRanges.offsetRangeBuckets(DatePart.Week, 0, -3, Some("2024-02-25"))
          .zipWithIndex.map { case (r, i) => r -> ("offset_range_buckets", s"week_m$i") } ++
        DateRanges.offsetRangeBuckets(DatePart.Month, 0, -2, Some("2024-02-25"))
          .zipWithIndex.map { case (r, i) => r -> ("offset_range_buckets", s"month_m$i") }
      val rangeRows = (t12 ++ t14 ++ t15 ++ t16 ++ t17 ++ t19).map {
        case (r, (op, tag)) => (op, tag, r.dateStart, r.dateEnd)
      }
      (t7 ++ t8 ++ rangeRows).toDF("op", "tag", "v1", "v2")
    }),

    // T13 `overlaps` — the range-×-range interval-join predicate
    // (date.py:665-666) exercised end-to-end: calendar month periods ×
    // reverse-chronological lookback chunks, keeping overlapping pairs
    // with their inclusive overlap-day counts. Both lists are driver-side
    // range algebra (O(#ranges), broadcast); the oracle recomputes every
    // bound from the input literals with SQL date arithmetic, so the
    // predicate AND the bound generators are both hash-checked.
    "q52_overlap_join" -> ((s, dir) => {
      import s.implicits._
      val periods = DateRanges.calendarPeriods(
        DatePart.Month, count = 3, dateEnd = Some("2024-03-20"))
      val chunks = DateRanges.splitLookbackPeriod(
        totalDays = 45, chunkDays = 10, dateEnd = Some("2024-03-20"))
      val p = periods.map(r => (r.dateStart, r.dateEnd)).toDF("p_start", "p_end")
        .withColumn("ps", col("p_start").cast("date"))
        .withColumn("pe", col("p_end").cast("date"))
      val c = chunks.map(r => (r.dateStart, r.dateEnd)).toDF("c_start", "c_end")
        .withColumn("cs", col("c_start").cast("date"))
        .withColumn("ce", col("c_end").cast("date"))
      p.join(broadcast(c),
          DateFunctions.overlaps(col("ps"), col("pe"), col("cs"), col("ce")))
        .select(col("p_start"), col("p_end"), col("c_start"), col("c_end"),
          DateFunctions.daysCount(greatest(col("ps"), col("cs")),
            least(col("pe"), col("ce"))).as("overlap_days"))
    }),

    // Raw-timestamp precision pin: µs-rendered ts must match DuckDB's
    // ns→µs cast exactly (guards the integer-div conversion).
    "q28_raw_ts" -> ((s, dir) => {
      Tables(s, dir, "events")
        .filter(col("event_id") % 97 === 0)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_micro"))
    }))

  def oracle: Map[String, String] = {
    // Independent reformulation: start + i*step from the ORIGINAL start
    // (DuckDB's generate_series steps months cumulatively, which diverges
    // from BQ/reference/Spark on month-end clamping — so multiply instead).
    def seriesSql(tag: String, start: String, end: String, iv: Int, part: DatePart): String = {
      val stepExpr = part match {
        case DatePart.Day     => s"(i * $iv) * INTERVAL 1 DAY"
        case DatePart.Week    => s"(i * ${iv * 7}) * INTERVAL 1 DAY"
        case DatePart.Month   => s"(i * $iv) * INTERVAL 1 MONTH"
        case DatePart.Quarter => s"(i * ${iv * 3}) * INTERVAL 1 MONTH"
        case DatePart.Year    => s"(i * $iv) * INTERVAL 1 YEAR"
      }
      val cmp = if (iv > 0) s"d BETWEEN DATE '$start' AND DATE '$end'"
                else s"d BETWEEN DATE '$end' AND DATE '$start'"
      s"""SELECT '$tag' AS series, strftime(d, '%Y-%m-%d') AS d FROM (
         |  SELECT CAST(DATE '$start' + $stepExpr AS DATE) AS d
         |  FROM generate_series(0, 200) t(i)) WHERE $cmp""".stripMargin
    }

    Map(
      "q4_generate_date_array" ->
        arraySpecs.map { case (tag, st, en, iv, part) => seriesSql(tag, st, en, iv, part) }
          .mkString("\nUNION ALL\n"),

      "q5_relative_date_frames" -> {
        val values = frameSpecs.map { case (p, n) => s"('$p', $n)" }.mkString(", ")
        s"""WITH p(date_part, n) AS (VALUES $values),
           |base AS (SELECT date_part, CAST(n AS INT) AS n, DATE '$FrameAnchor' AS d FROM p)
           |SELECT date_part, n,
           |  strftime(CASE date_part
           |    WHEN 'DAY' THEN d + n * INTERVAL 1 DAY
           |    WHEN 'WEEK' THEN date_trunc('week', d + n * INTERVAL 7 DAY)
           |    WHEN 'MONTH' THEN date_trunc('month', d + n * INTERVAL 1 MONTH)
           |    WHEN 'QUARTER' THEN date_trunc('quarter', d + n * INTERVAL 3 MONTH)
           |    WHEN 'YEAR' THEN date_trunc('year', d + n * INTERVAL 1 YEAR)
           |  END, '%Y-%m-%d') AS frame_start,
           |  strftime(CASE date_part
           |    WHEN 'DAY' THEN d + n * INTERVAL 1 DAY
           |    WHEN 'WEEK' THEN date_trunc('week', d + n * INTERVAL 7 DAY) + INTERVAL 6 DAY
           |    WHEN 'MONTH' THEN last_day(d + n * INTERVAL 1 MONTH)
           |    WHEN 'QUARTER' THEN date_trunc('quarter', d + n * INTERVAL 3 MONTH) + INTERVAL 3 MONTH - INTERVAL 1 DAY
           |    WHEN 'YEAR' THEN date_trunc('year', d + n * INTERVAL 1 YEAR) + INTERVAL 1 YEAR - INTERVAL 1 DAY
           |  END, '%Y-%m-%d') AS frame_end
           |FROM base""".stripMargin
      },

      "q6_backfill_range_join" -> {
        val ranges = DateRanges
          .splitLookbackPeriod(totalDays = 30, chunkDays = 7, dateEnd = Some("2024-01-30"))
          .map(r => s"('${r.dateStart}', '${r.dateEnd}')").mkString(", ")
        s"""SELECT r.range_start, r.range_end,
           |  count(*) AS cnt, round(sum(e.value), 2) AS sum_value
           |FROM events e
           |JOIN (VALUES $ranges) r(range_start, range_end)
           |  ON CAST(e.ts AS DATE) BETWEEN CAST(r.range_start AS DATE)
           |                            AND CAST(r.range_end AS DATE)
           |GROUP BY r.range_start, r.range_end""".stripMargin
      },

      "q24_yearmonth_rollup" ->
        """SELECT strftime(ts, '%Y-%m') AS ym, event_type,
          |  count(*) AS cnt, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2""".stripMargin,

      // Weekly periods ending 2024-02-25 (a Sunday): week i spans
      // [trunc - 7i, trunc - 7i + 6], most recent trimmed to date_end.
      "q25_calendar_cohorts" ->
        """WITH p AS (
          |  SELECT strftime(date_trunc('week', DATE '2024-02-25') - i * INTERVAL 7 DAY,
          |                  '%Y-%m-%d') AS period_start,
          |    strftime(least(date_trunc('week', DATE '2024-02-25') - i * INTERVAL 7 DAY
          |                   + INTERVAL 6 DAY, TIMESTAMP '2024-02-25'), '%Y-%m-%d') AS period_end
          |  FROM generate_series(0, 3) t(i))
          |SELECT p.period_start, p.period_end,
          |  count(*) AS cnt, count(DISTINCT e.user_id) AS users
          |FROM events e JOIN p
          |  ON CAST(e.ts AS DATE) BETWEEN CAST(p.period_start AS DATE)
          |                            AND CAST(p.period_end AS DATE)
          |GROUP BY 1, 2""".stripMargin,

      // 7-day chunks of 2024-01-01..30: starts 1,8,15,22,29; last is 2 days.
      "q26_split_chunks" ->
        """WITH c AS (
          |  SELECT strftime(DATE '2024-01-01' + i * INTERVAL 7 DAY, '%Y-%m-%d') AS chunk_start,
          |    strftime(least(DATE '2024-01-01' + (i * 7 + 6) * INTERVAL 1 DAY,
          |                   TIMESTAMP '2024-01-30'), '%Y-%m-%d') AS chunk_end,
          |    CAST(date_diff('day', DATE '2024-01-01' + i * INTERVAL 7 DAY,
          |      least(DATE '2024-01-01' + (i * 7 + 6) * INTERVAL 1 DAY,
          |            TIMESTAMP '2024-01-30')) + 1 AS INT) AS chunk_days
          |  FROM generate_series(0, 4) t(i))
          |SELECT c.chunk_start, c.chunk_end, c.chunk_days, count(*) AS cnt
          |FROM events e JOIN c
          |  ON CAST(e.ts AS DATE) BETWEEN CAST(c.chunk_start AS DATE)
          |                            AND CAST(c.chunk_end AS DATE)
          |GROUP BY 1, 2, 3""".stripMargin,

      "q27_timestamp_emitters" ->
        """SELECT o_orderstatus AS status,
          |  strftime(min(o_orderdate), '%Y-%m-%d') AS fb_since,
          |  strftime(max(o_orderdate), '%Y-%m-%d') AS fb_until,
          |  strftime(min(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS ts_start,
          |  strftime(max(o_orderdate) + INTERVAL 1 DAY, '%Y-%m-%dT%H:%M:%SZ') AS ts_end,
          |  strftime(max(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS ts_end_same,
          |  CAST(day(min(o_orderdate)) AS INT) AS bing_start_day,
          |  CAST(month(max(o_orderdate)) AS INT) AS bing_end_month,
          |  CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
          |                 CAST(max(o_orderdate) AS DATE)) + 1 AS INT) AS days_count
          |FROM orders GROUP BY 1""".stripMargin,

      // Both range lists recomputed from the literals: month periods as in
      // q32's offset_range_buckets month form; lookback chunks walk back
      // from the end date, start clamped at end − (total−1) days.
      "q52_overlap_join" ->
        """WITH p AS (
          |  SELECT strftime(date_trunc('month', DATE '2024-03-20' - i * INTERVAL 1 MONTH),
          |                  '%Y-%m-%d') AS p_start,
          |    strftime(least(CAST(last_day(DATE '2024-03-20' - i * INTERVAL 1 MONTH) AS TIMESTAMP),
          |                   TIMESTAMP '2024-03-20'), '%Y-%m-%d') AS p_end
          |  FROM generate_series(0, 2) t(i)),
          |c AS (
          |  SELECT strftime(greatest(DATE '2024-03-20' - (i * 10 + 9) * INTERVAL 1 DAY,
          |                           DATE '2024-03-20' - 44 * INTERVAL 1 DAY), '%Y-%m-%d') AS c_start,
          |    strftime(DATE '2024-03-20' - (i * 10) * INTERVAL 1 DAY, '%Y-%m-%d') AS c_end
          |  FROM generate_series(0, 4) t(i))
          |SELECT p.p_start, p.p_end, c.c_start, c.c_end,
          |  CAST(date_diff('day',
          |         greatest(CAST(p.p_start AS DATE), CAST(c.c_start AS DATE)),
          |         least(CAST(p.p_end AS DATE), CAST(c.c_end AS DATE))) + 1 AS INT) AS overlap_days
          |FROM p JOIN c
          |  ON CAST(p.p_start AS DATE) <= CAST(c.c_end AS DATE)
          | AND CAST(p.p_end AS DATE) >= CAST(c.c_start AS DATE)""".stripMargin,

      "q28_raw_ts" ->
        """SELECT event_id,
          |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_micro
          |FROM events WHERE event_id % 97 = 0""".stripMargin,

      // Independent recomputation of every q32 row from the INPUT literals
      // (DuckDB date arithmetic, never copied outputs).
      "q32_daterange_methods" ->
        """WITH b(s, e) AS (VALUES (DATE '2024-02-10', DATE '2024-03-05'))
          |SELECT 'as_tuple' AS op, 'base' AS tag,
          |  strftime(s, '%Y-%m-%d') AS v1, strftime(e, '%Y-%m-%d') AS v2 FROM b
          |UNION ALL SELECT 'as_list', 'base', strftime(s, '%Y-%m-%d'), strftime(e, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'as_dict', 'base', strftime(s, '%Y-%m-%d'), strftime(e, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'format', 'dots',
          |  strftime(s, '%Y-%m-%d') || '..' || strftime(e, '%Y-%m-%d'), '-' FROM b
          |UNION ALL SELECT 'custom_keys', 'since_until',
          |  strftime(s, '%Y-%m-%d'), strftime(e, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'to_reddit_range', 'base',
          |  strftime(s, '%Y-%m-%dT%H:%M:%SZ'),
          |  strftime(e + INTERVAL 1 DAY, '%Y-%m-%dT%H:%M:%SZ') FROM b
          |UNION ALL SELECT 'to_reddit_range_same', 'base',
          |  strftime(s, '%Y-%m-%dT%H:%M:%SZ'), strftime(e, '%Y-%m-%dT%H:%M:%SZ') FROM b
          |UNION ALL SELECT 'around_date', 'lb10_lf5',
          |  strftime(DATE '2024-03-15' - INTERVAL 10 DAY, '%Y-%m-%d'),
          |  strftime(DATE '2024-03-15' + INTERVAL 5 DAY, '%Y-%m-%d')
          |UNION ALL SELECT 'around_date', 'zero',
          |  strftime(DATE '2024-03-15', '%Y-%m-%d'), strftime(DATE '2024-03-15', '%Y-%m-%d')
          |UNION ALL SELECT 'extend_by_days', 's3_e4',
          |  strftime(s - INTERVAL 3 DAY, '%Y-%m-%d'), strftime(e + INTERVAL 4 DAY, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'shift_by_days', 'minus7',
          |  strftime(s - INTERVAL 7 DAY, '%Y-%m-%d'), strftime(e - INTERVAL 7 DAY, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'extend_to_week_bounds', 'base',
          |  strftime(date_trunc('week', s), '%Y-%m-%d'),
          |  strftime(date_trunc('week', e) + INTERVAL 6 DAY, '%Y-%m-%d') FROM b
          |UNION ALL SELECT 'extend_to_month_bounds', 'base',
          |  strftime(date_trunc('month', s), '%Y-%m-%d'), strftime(last_day(e), '%Y-%m-%d') FROM b
          |UNION ALL
          |SELECT 'split_month_8_8_8_rest', a.tag || '_' || CAST(i + 1 AS VARCHAR),
          |  strftime(date_trunc('month', a.d) + (i * 8) * INTERVAL 1 DAY, '%Y-%m-%d'),
          |  strftime(CASE WHEN i < 3 THEN date_trunc('month', a.d) + (i * 8 + 7) * INTERVAL 1 DAY
          |                ELSE CAST(last_day(a.d) AS TIMESTAMP) END, '%Y-%m-%d')
          |FROM (VALUES ('leap', DATE '2024-02-15'), ('nonleap', DATE '2023-02-10')) a(tag, d),
          |     generate_series(0, 3) t(i)
          |UNION ALL SELECT 'single_calendar_period', 'quarter_m1',
          |  strftime(date_trunc('quarter', DATE '2024-05-20' - INTERVAL 3 MONTH), '%Y-%m-%d'),
          |  strftime(date_trunc('quarter', DATE '2024-05-20' - INTERVAL 3 MONTH)
          |           + INTERVAL 3 MONTH - INTERVAL 1 DAY, '%Y-%m-%d')
          |UNION ALL SELECT 'single_calendar_period', 'year_p1',
          |  strftime(date_trunc('year', DATE '2024-05-20' + INTERVAL 1 YEAR), '%Y-%m-%d'),
          |  strftime(date_trunc('year', DATE '2024-05-20' + INTERVAL 1 YEAR)
          |           + INTERVAL 1 YEAR - INTERVAL 1 DAY, '%Y-%m-%d')
          |UNION ALL
          |SELECT 'offset_range_buckets', 'week_m' || CAST(i AS VARCHAR),
          |  strftime(date_trunc('week', DATE '2024-02-25' - i * INTERVAL 7 DAY), '%Y-%m-%d'),
          |  strftime(least(date_trunc('week', DATE '2024-02-25' - i * INTERVAL 7 DAY)
          |                 + INTERVAL 6 DAY, TIMESTAMP '2024-02-25'), '%Y-%m-%d')
          |FROM generate_series(0, 3) t(i)
          |UNION ALL
          |SELECT 'offset_range_buckets', 'month_m' || CAST(i AS VARCHAR),
          |  strftime(date_trunc('month', DATE '2024-02-25' - i * INTERVAL 1 MONTH), '%Y-%m-%d'),
          |  strftime(least(CAST(last_day(DATE '2024-02-25' - i * INTERVAL 1 MONTH) AS TIMESTAMP),
          |                 TIMESTAMP '2024-02-25'), '%Y-%m-%d')
          |FROM generate_series(0, 2) t(i)""".stripMargin)
  }
}
