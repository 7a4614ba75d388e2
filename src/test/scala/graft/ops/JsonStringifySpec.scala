package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D8 convert_to_json_string behavior (reference
  * `data_structures.py:1764-1826`).
  */
class JsonStringifySpec extends SparkSpec {
  import spark.implicits._

  test("type-dispatched stringification") {
    val df = Seq(1).toDF("i").select(
      lit("raw").as("s"),                       // idempotent
      lit(42L).as("n"),
      lit(3.14).as("f"),
      lit(true).as("b"),
      struct(lit(1L).as("a")).as("obj"),
      array(lit(1L), lit(2L)).as("arr"),
      lit(null).cast("string").as("nul"),
      lit("2024-01-15").cast("date").as("d"))
    val out = JsonStringify()(df)
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    assert(out.head() == Row(
      "raw", "42", "3.14", "true", """{"a":1}""", "[1,2]", null, "\"2024-01-15\""))
  }

  test("idempotent: applying twice is a no-op") {
    val df = Seq(1).toDF("i").select(struct(lit(1L).as("a")).as("obj"), lit("x").as("s"))
    val once = JsonStringify()(df)
    val twice = JsonStringify()(once)
    assert(once.head() == twice.head())
  }

  test("keys whitelist limits stringification") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = JsonStringify(keys = Some(Seq("a")))(df)
    assert(out.schema("a").dataType.typeName == "string")
    assert(out.schema("b").dataType.typeName == "long")
  }
}
