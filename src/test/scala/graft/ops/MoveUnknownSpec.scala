package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D3 move_unknown_keys_to_extra behavior
  * (`/root/reference/tests/test_data_structures.py:611-780`).
  */
class MoveUnknownSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq((123L, "alex", 30L, "berlin")).toDF("id", "name", "age", "city")

  test("moves unknown keys into sorted extra struct; output sorted") {
    val (out, moved) = MoveUnknown(Seq("id", "name")).plan(data)
    assert(out.columns.toSeq == Seq("extra_collected", "id", "name"))
    assert(out.schema("extra_collected").dataType.simpleString == "struct<age:bigint,city:string>")
    assert(moved == Seq("age", "city"))
    assert(out.head() == Row(Row(30L, "berlin"), 123L, "alex"))
  }

  test("all allowed: no extra key added; always_add_extra forces it") {
    val d = data.select(col("id"), col("name"))
    val (out, moved) = MoveUnknown(Seq("id", "name")).plan(d)
    assert(out.columns.toSeq == Seq("id", "name") && moved.isEmpty)
    val forced = MoveUnknown(Seq("id", "name"), alwaysAddExtra = true)(d)
    assert(forced.columns.contains("extra_collected"))
  }

  test("extraKey=None discards extras") {
    val out = MoveUnknown(Seq("id"), extraKey = None)(data)
    assert(out.columns.toSeq == Seq("id"))
  }

  test("custom extra key") {
    val out = MoveUnknown(Seq("id"), extraKey = Some("other_fields"))(data)
    assert(out.columns.toSeq == Seq("id", "other_fields"))
  }

  test("preserve_order follows whitelist order, extra last") {
    val out = MoveUnknown(Seq("name", "id"), preserveOrder = true)(data)
    assert(out.columns.toSeq == Seq("name", "id", "extra_collected"))
  }

  test("fill_missing adds absent whitelist keys as NULLs") {
    val d = Seq(Tuple1(1L)).toDF("id")
    val out = MoveUnknown(Seq("id", "name"), fillMissing = true)(d)
    assert(out.columns.toSeq == Seq("id", "name"))
    assert(out.head() == Row(1L, null))
  }

  test("fill_missing does not overwrite existing values") {
    val out = MoveUnknown(Seq("id", "name"), fillMissing = true)(data)
    assert(out.select("name").head() == Row("alex"))
  }

  test("input column named extra_collected is renamed _original and kept") {
    val d = Seq((1L, "x", "y")).toDF("id", "extra_collected", "other")
    val (out, moved) = MoveUnknown(Seq("id")).plan(d)
    assert(out.columns.toSeq == Seq("extra_collected", "extra_collected_original", "id"))
    assert(moved == Seq("other"))
    assert(out.select("extra_collected_original").head() == Row("x"))
  }

  test("cascade rename when _original also taken") {
    val d = Seq((1L, "a", "b")).toDF("id", "extra_collected", "extra_collected_original")
    val out = MoveUnknown(Seq("id"))(d)
    // both conflicting columns stay top-level under free names
    assert(out.columns.count(_.startsWith("extra_collected_original")) == 2)
  }
}
