package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D7 normalize_date_fields behavior, porting
  * `/root/reference/tests/test_data_structures.py:1289-1430`.
  */
class NormalizeDateFieldsSpec extends SparkSpec {
  import spark.implicits._
  import ConvertType._

  private def base = Seq(1).toDF("i")

  test("suffix rule: rename + epoch→ISO") {
    val df = base.select(lit(1735056631L).as("created_at"), lit("x").as("id"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIso, target = "datetime")))(df)
    assert(out.columns.toSeq == Seq("datetime_created", "id"))
    assert(out.head().get(0) == "2024-12-24T16:10:31")
  }

  test("same source, different targets (date vs datetime)") {
    val df = base.select(lit(1735056631L).as("created_at"))
    val dt = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIso, target = "datetime")))(df)
    val d = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIsoDate, target = "date")))(df)
    assert(dt.columns.toSeq == Seq("datetime_created") && dt.head().get(0) == "2024-12-24T16:10:31")
    assert(d.columns.toSeq == Seq("date_created") && d.head().get(0) == "2024-12-24")
  }

  test("suffix list matches any; prefix strips front") {
    val df = base.select(lit(1L).as("created_at"), lit(2L).as("updated_time"), lit(3L).as("ts_event"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at", "_time"), convert = TsToIsoDate, target = "date"),
      DateFieldRule(prefix = Seq("ts_"), convert = TsToIsoDate, target = "date")))(df)
    assert(out.columns.toSeq == Seq("date_created", "date_updated", "date_event"))
  }

  test("equals uses full key as base") {
    val df = base.select(lit(1735056631L).as("timestamp"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(equalsTo = Seq("timestamp"), convert = TsToIsoDate, target = "date")))(df)
    assert(out.columns.toSeq == Seq("date_timestamp"))
  }

  test("regex strips matched span") {
    val df = base.select(lit(1735056631L).as("event_ts_field"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(regex = Some("_ts_"), convert = TsToIsoDate, target = "date")))(df)
    assert(out.columns.toSeq == Seq("date_eventfield"))
  }

  test("first matching rule wins; strip_match=false keeps key") {
    val df = base.select(lit(1735056631L).as("created_at"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIsoDate, target = "date"),
      DateFieldRule(suffix = Seq("at"), convert = TsToIso, target = "datetime")))(df)
    assert(out.columns.toSeq == Seq("date_created"))
    val keep = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIsoDate, target = "date",
        stripMatch = false)))(df)
    assert(keep.columns.toSeq == Seq("date_created_at"))
  }

  test("keep_original keeps old field before renamed") {
    val df = base.select(lit(1735056631L).as("created_at"), lit("x").as("id"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIso, target = "datetime")),
      keepOriginal = true)(df)
    assert(out.columns.toSeq == Seq("created_at", "datetime_created", "id"))
    assert(out.head().get(0) == 1735056631L)
    assert(out.head().get(1) == "2024-12-24T16:10:31")
  }

  test("recursive descends structs, not arrays") {
    val df = base.select(
      struct(lit(1735056631L).as("updated_at")).as("meta"),
      array(struct(lit(1L).as("x_at"))).as("items"))
    val out = NormalizeDateFields(Seq(
      DateFieldRule(suffix = Seq("_at"), convert = TsToIsoDate, target = "date")),
      recursive = true)(df)
    assert(out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("date_updated"))
    // array item fields untouched
    assert(out.schema("items").dataType.simpleString == "array<struct<x_at:bigint>>")
  }

  test("exactly one matcher required") {
    intercept[IllegalArgumentException] {
      DateFieldRule(suffix = Seq("_at"), prefix = Seq("ts_"), convert = TsToIso, target = "t")
    }
    intercept[IllegalArgumentException] {
      DateFieldRule(convert = TsToIso, target = "t")
    }
  }
}
