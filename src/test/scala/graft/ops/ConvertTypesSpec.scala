package graft.ops

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D4 convert_dict_types behavior, porting the parametrized matrix from
  * `/root/reference/tests/test_data_structures.py:788-960` (UTC session,
  * matching the reference test env).
  */
class ConvertTypesSpec extends SparkSpec {
  import spark.implicits._
  import ConvertType._

  private def one(value: org.apache.spark.sql.Column, t: CT,
                  strict: Boolean = false, emptyToNone: Boolean = false): Any = {
    val df = Seq(1).toDF("i").select(value.as("test_key"))
    ConvertTypes(Map("test_key" -> t), strict = strict, emptyStringToNone = emptyToNone)(df)
      .head().get(0)
  }

  test("single-value conversion matrix") {
    assert(one(lit("42"), ToInt) == 42L)
    assert(one(lit("3.14"), ToInt) == 3L) // via float, truncating
    assert(one(lit(true), ToInt) == 1L)
    assert(one(lit("3.14"), ToFloat) == 3.14)
    assert(one(lit(42), ToFloat) == 42.0)
    assert(one(lit(true), ToFloat) == 1.0)
    for (s <- Seq("true", "1", "yes", "on", "TRUE")) assert(one(lit(s), ToBool) == true, s)
    for (s <- Seq("false", "0", "no", "anything")) assert(one(lit(s), ToBool) == false, s)
    assert(one(lit(1), ToBool) == true)
    assert(one(lit(0), ToBool) == false)
    assert(one(lit(3.14), ToBool) == true)
    assert(one(lit("2024-12-25"), ToDate) == Date.valueOf("2024-12-25"))
    assert(one(lit("2024-12-25T15:30:45"), ToDatetime) == Timestamp.valueOf("2024-12-25 15:30:45"))
    assert(one(lit("2024-12-25 15:30:45"), ToDatetime) == Timestamp.valueOf("2024-12-25 15:30:45"))
    assert(one(lit("2024-12-25"), ToDatetime) == Timestamp.valueOf("2024-12-25 00:00:00"))
    assert(one(lit("1735056631"), TsToIso) == "2024-12-24T16:10:31")
    assert(one(lit(1735056631L), TsToIso) == "2024-12-24T16:10:31")
    assert(one(lit("1735056631"), TsToIsoDate) == "2024-12-24")
    assert(one(lit(1735056631L), TsToIsoYm) == "2024-12")
    assert(one(lit(1735056631L), TsToIsoY) == "2024")
    assert(one(lit(42), ToStr) == "42")
    assert(one(lit(true), ToStr) == "True")
    assert(one(lit(3.14), ToStr) == "3.14")
  }

  test("timestamp → timestamp type") {
    assert(one(lit("1735056631"), ToTimestamp) == Timestamp.valueOf("2024-12-24 16:10:31"))
  }

  test("lenient failures → NULL; strict raises") {
    assert(one(lit("abc"), ToInt) == null)
    assert(one(lit("1e5"), ToInt) == null) // reference: int("1e5") raises → lenient keeps
    assert(one(lit("not-a-date"), ToDate) == null)
    assert(one(lit("nope"), ToDatetime) == null)
    val e = intercept[Exception] { one(lit("abc"), ToInt, strict = true) }
    assert(e.getMessage.contains("Unable to convert"))
  }

  test("empty string handling") {
    assert(one(lit(""), ToInt, emptyToNone = true) == null)
    assert(one(lit(""), ToInt, emptyToNone = false) == null) // '' can't live in a long column
    assert(one(lit(""), ToStr, emptyToNone = false) == "")
    assert(one(lit(""), ToStr, emptyToNone = true) == null)
  }

  test("None preserved; unknown keys unchanged") {
    val df = Seq(("42", "3.14")).toDF("str_int", "str_float")
      .withColumn("none_val", lit(null).cast("string"))
    val out = ConvertTypes(Map("str_int" -> ToInt, "none_val" -> ToInt))(df)
    assert(out.head() == Row(42L, "3.14", null))
  }

  test("recursive vs non-recursive nested conversion") {
    val df = Seq(1).toDF("i").select(
      lit("42").as("top_level"),
      struct(lit("3.14").as("inner_val"),
        struct(lit("true").as("deep_val")).as("deep_nested")).as("nested"),
      array(struct(lit("100").as("value")), struct(lit("200").as("value"))).as("items"))
    val schema = Map("top_level" -> ToInt, "inner_val" -> ToFloat,
      "deep_val" -> ToBool, "value" -> ToInt)
    val simple = ConvertTypes(schema, recursive = false)(df).head()
    assert(simple.get(0) == 42L)
    assert(simple.getStruct(1).get(0) == "3.14") // unchanged
    val rec = ConvertTypes(schema, recursive = true)(df).head()
    assert(rec.get(0) == 42L)
    assert(rec.getStruct(1).get(0) == 3.14)
    assert(rec.getStruct(1).getStruct(1).get(0) == true)
    assert(rec.getSeq[Row](2).map(_.get(0)) == Seq(100L, 200L))
  }

  test("custom datetime formats tried in order") {
    val out = one(lit("25/12/2024 15:30"), ToDatetime)
    assert(out == null) // default formats don't match
    val df = Seq(1).toDF("i").select(lit("25/12/2024 15:30").as("dt"))
    val conv = ConvertTypes(Map("dt" -> ToDatetime),
      datetimeFormats = Seq("dd/MM/yyyy HH:mm", "yyyy-MM-dd'T'HH:mm:ss"))(df)
    assert(conv.head().get(0) == Timestamp.valueOf("2024-12-25 15:30:00"))
  }
}
