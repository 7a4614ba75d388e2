package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D6 flatten_dict behavior, mirroring the reference docstring examples and
  * unit tables (`/root/reference/etlutil/data_structures.py:1527-1548`,
  * `tests/test_data_structures.py`).
  */
class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1, 2, 3)).toDF("x", "y", "z")

  test("flattens nested structs with __ separator") {
    val df = base.select(
      struct(lit(1).as("b"), lit(2).as("c")).as("a"), lit(3).as("d"))
    val out = Flatten()(df)
    assert(out.columns.toSeq == Seq("a__b", "a__c", "d"))
    assert(out.head() == Row(1, 2, 3))
  }

  test("flattens three levels deep") {
    val df = base.select(struct(struct(lit(1).as("c")).as("b")).as("a"))
    val out = Flatten()(df)
    assert(out.columns.toSeq == Seq("a__b__c"))
    assert(out.head() == Row(1))
  }

  test("custom separator") {
    val df = base.select(struct(lit(1).as("b")).as("a"))
    assert(Flatten(sep = ".")(df).columns.toSeq == Seq("a.b"))
  }

  test("keys_to_skip keeps nested structure; skip wins over flat") {
    val df = base.select(
      struct(lit(1).as("b")).as("a"), struct(lit(1).as("x")).as("stats"))
    val out = Flatten(keysToSkip = Set("stats"))(df)
    assert(out.columns.toSeq == Seq("a__b", "stats"))
    val both = Flatten(keysToFlat = Some(Set("a", "stats")), keysToSkip = Set("stats"))(df)
    assert(both.columns.toSeq == Seq("a__b", "stats"))
  }

  test("keys_to_flat whitelist; empty whitelist flattens nothing") {
    val df = base.select(
      struct(lit(1).as("b")).as("a"), struct(lit(1).as("x")).as("stats"))
    assert(Flatten(keysToFlat = Some(Set("a")))(df).columns.toSeq == Seq("a__b", "stats"))
    assert(Flatten(keysToFlat = Some(Set.empty))(df).columns.toSeq == Seq("a", "stats"))
  }

  test("max_depth limits collapse levels; 0 is a no-op") {
    val df = base.select(struct(struct(lit(1).as("c")).as("b")).as("a"))
    val d1 = Flatten(maxDepth = Some(1))(df)
    assert(d1.columns.toSeq == Seq("a__b"))
    assert(d1.schema("a__b").dataType.typeName == "struct")
    assert(Flatten(maxDepth = Some(0))(df).columns.toSeq == Seq("a"))
  }

  test("keep_original keeps nested value at every level, written after flat paths") {
    val df = base.select(struct(struct(lit(1).as("c")).as("b")).as("a"))
    val out = Flatten(keepOriginal = true)(df)
    assert(out.columns.toSeq == Seq("a__b__c", "a__b", "a"))
    assert(out.select("a__b__c").head() == Row(1))
  }

  test("arrays and maps pass through un-descended") {
    val df = base.select(
      array(struct(lit(1).as("b"))).as("arr"),
      map(lit("k"), lit(1)).as("m"),
      struct(lit(2).as("y")).as("s"))
    val out = Flatten()(df)
    assert(out.columns.toSeq == Seq("arr", "m", "s__y"))
  }

  test("negative max_depth rejected") {
    intercept[IllegalArgumentException] { Flatten(maxDepth = Some(-1)) }
  }
}
