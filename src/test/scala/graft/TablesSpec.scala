package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Ingestion-robustness contract for the events read boundary.
  *
  * The driver has regenerated `/root/testdata` with different physical
  * parquet encodings for `events.ts` across rounds — INT64 TIMESTAMP(NANOS)
  * (reads as LongType under nanosAsLong), TIMESTAMP_MICROS(isAdjustedToUTC=0)
  * (reads as TIMESTAMP_NTZ), and plain TIMESTAMP_MICROS(isAdjustedToUTC=1)
  * (reads as TIMESTAMP). `Tables.apply` must accept ALL of them and emit one
  * logical type with identical wall-clock values, the way the reference's
  * `to_date` accepts its whole DateLike union (etlutil/date.py:27-37,
  * tests/test_date.py:45) — so the next regeneration cannot silently break
  * every downstream cast/watermark again (the round-8 regression).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // Wall-clock instants (UTC) the three layouts must all round-trip to.
  private val isoTimes = Seq(
    "2024-03-01 00:00:00", "2024-03-15 12:34:56.789012", "2024-03-31 23:59:59")

  private def writeLayout(layout: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$layout").toFile
    dir.deleteOnExit()
    val base = isoTimes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "ts_str")
    val df: DataFrame = layout match {
      // Spark cannot WRITE parquet TIMESTAMP(NANOS); under nanosAsLong the
      // reader surfaces that layout as plain LongType — identical to a raw
      // INT64 epoch-nanos column, so writing one exercises the same branch.
      case "nanos" => base.select($"event_id",
        (unix_micros(to_timestamp($"ts_str")) * 1000L).as("ts"))
      case "ntz" => base.select($"event_id",
        to_timestamp($"ts_str").cast(TimestampNTZType).as("ts"))
      case "utc" => base.select($"event_id",
        to_timestamp($"ts_str").as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.getAbsolutePath
  }

  private val layouts = Seq("nanos", "ntz", "utc")

  test("Tables.apply normalizes every physical ts encoding to TimestampType") {
    val results = layouts.map { l =>
      val df = Tables(spark, writeLayout(l), "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"layout $l not normalized: ${df.schema("ts").dataType}")
      l -> df.select($"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("iso"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    }.toMap
    assert(results("ntz") == results("nanos"),
      s"NTZ wall-clock drifted: ${results("ntz")} vs ${results("nanos")}")
    assert(results("utc") == results("nanos"),
      s"UTC wall-clock drifted: ${results("utc")} vs ${results("nanos")}")
  }

  test("NTZ normalization fails loud if the session TZ was reset off UTC") {
    // pinConf pins UTC once per session, but external code can reset the
    // conf afterwards; a silent NTZ cast would then shift every wall-clock
    // value by the zone offset. The boundary re-checks at cast time.
    val dir = writeLayout("ntz")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalStateException] { Tables(spark, dir, "events") }
      assert(e.getMessage.contains("UTC"))
      // the TZ-independent encodings still load under any session zone
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      assert(Tables(spark, dir, "events").schema("ts").dataType == TimestampType)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("orders/lineitem date columns read as timestamps, never nanos-longs") {
    // o_orderdate / l_shipdate are intentionally NOT normalized: their
    // consumers use only NTZ-safe ops (literal compares, date_format,
    // grouping), and a post-scan cast would break the l_shipdate/o_orderdate
    // filter pushdown that PlanAssertSpec pins. This guard fires loudly if
    // a future testdata regeneration ships them as INT64 nanos (which the
    // session-wide nanosAsLong pin would surface as LongType) — extend
    // Tables.normalizeTs to those columns at that point, preserving the
    // raw-column pushdown the way eventsBetween does.
    val dir = "/root/testdata/sf0.001"
    val dateCols = Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")
    dateCols.foreach { case (t, c) =>
      val dt = Tables(spark, dir, t).schema(c).dataType
      assert(dt == TimestampType || dt == TimestampNTZType,
        s"$t.$c reads as $dt — the testdata layout changed; normalize it in Tables")
    }
  }

  test("eventsBetween pushes the window predicate in every encoding") {
    layouts.foreach { l =>
      val dir = writeLayout(l)
      val df = Tables.eventsBetween(spark, dir, "2024-03-10", "2024-03-20")
      assert(df.schema("ts").dataType == TimestampType, s"layout $l")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
        s"layout $l: window not pushed to scan:\n$plan")
      val ids = df.select($"event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L), s"layout $l window selected wrong rows: $ids")
    }
  }
}
