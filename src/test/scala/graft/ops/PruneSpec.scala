package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D1 prune_data behavior, mirroring the reference unit tables
  * (`/root/reference/tests/test_data_structures.py:24-190`), adjusted for
  * the documented columnar divergences (fixed schema: removed-by-value →
  * NULL, emptied struct → static drop).
  */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(1).toDF("one")

  test("removes keys at any depth; emptied structs drop statically") {
    val df = base.select(
      lit(1).as("a"),
      struct(lit(2).as("secret"), lit(3).as("keep")).as("x"),
      array(struct(lit(4).as("secret"), struct(lit(5).as("secret"), lit(6).as("w")).as("z"))).as("y"))
    val out = Prune.byNames(keysToRemove = Seq("secret"))(df)
    assert(out.columns.toSeq == Seq("a", "x", "y"))
    assert(out.schema("x").dataType.simpleString == "struct<keep:int>")
    // array elements: secret dropped, z kept with only w
    assert(out.schema("y").dataType.simpleString == "array<struct<z:struct<w:int>>>")
    assert(out.head() == Row(1, Row(3), Seq(Row(Row(6)))))
  }

  test("depth semantics mirror the reference table") {
    // reference tests/test_data_structures.py:34-50 (homogeneous-adjusted)
    def df = base.select(
      lit(1).as("a"),
      struct(lit(2).as("secret"), lit(9).as("k")).as("x"),
      array(struct(lit(4).as("secret"), struct(lit(5).as("secret")).as("z"), lit(7).as("w"))).as("y"))
    def names(d: Option[Int]) = {
      val out = Prune.byNames(keysToRemove = Seq("secret"), maxDepth = d)(df)
      (out.schema("x").dataType.simpleString, out.schema("y").dataType.simpleString)
    }
    // depth 0: only root-level keys filtered, no recursion
    assert(names(Some(0)) == ("struct<secret:int,k:int>",
      "array<struct<secret:int,z:struct<secret:int>,w:int>>"))
    // depth 1: x filtered; array elements untouched
    assert(names(Some(1)) == ("struct<k:int>",
      "array<struct<secret:int,z:struct<secret:int>,w:int>>"))
    // depth 2: array elements filtered, their z untouched
    assert(names(Some(2)) == ("struct<k:int>", "array<struct<z:struct<secret:int>,w:int>>"))
    // depth 3 == unlimited here; z emptied → dropped
    assert(names(Some(3)) == ("struct<k:int>", "array<struct<w:int>>"))
    assert(names(None) == ("struct<k:int>", "array<struct<w:int>>"))
  }

  test("remove_empty drops None/''/empty containers but keeps 0 and false") {
    val df = base.select(
      lit(null).cast("string").as("a"),
      lit("").as("b"),
      array().cast("array<int>").as("c"),
      lit(0).as("f"),
      lit(false).as("g"),
      array(lit(null).cast("string"), lit(""), lit("s")).as("h"))
    val out = Prune.byNames(removeEmpty = true)(df)
    // fixed schema: emptied fields become NULL rather than disappearing
    assert(out.head() == Row(null, null, null, 0, false, Seq("s")))
  }

  test("values_to_remove filters sequence/map elements, NULLs mapping fields") {
    val df = base.select(
      array(lit(0), lit(1), lit(5)).as("lst"),
      map(lit("a"), lit(0), lit("b"), lit(1)).as("mp"),
      lit(0).as("scalar"),
      lit("x").as("s"))
    val out = Prune.byNames(valuesToRemove = Seq(0, "x"))(df)
    assert(out.head() == Row(Seq(1, 5), Map("b" -> 1), null, null))
  }

  test("cross-type value literals never match (no ANSI cast errors)") {
    val df = base.select(lit(3L).as("n"), lit("3").as("s"))
    val out = Prune.byNames(valuesToRemove = Seq("CU"))(df)
    // string 'CU' cannot match a bigint; both values survive untouched
    assert(out.head() == Row(3L, "3"))
  }

  test("map keys filtered at runtime via literal list") {
    val df = base.select(map(lit("secret"), lit(1), lit("keep"), lit(2)).as("m"))
    val out = Prune.byNames(keysToRemove = Seq("secret"))(df)
    assert(out.head() == Row(Map("keep" -> 2)))
  }

  test("value predicate Column form (callable analog)") {
    val df = base.select(array(lit(1), lit(10), lit(3)).as("xs"))
    val p = Prune(
      keyPred = _ => false,
      valuePred = Some(_ => Some((c: org.apache.spark.sql.Column) => c > 5)))
    assert(p(df).head() == Row(Seq(1, 3)))
  }

  test("negative max_depth raises") {
    intercept[IllegalArgumentException] { Prune.byNames(maxDepth = Some(-1)) }
  }

  test("no-op prune returns all rows/columns unchanged") {
    val df = base.select(lit(1).as("a"), struct(lit(2).as("b")).as("s"))
    val out = Prune.byNames()(df)
    assert(out.columns.toSeq == Seq("a", "s"))
    assert(out.head() == Row(1, Row(2)))
  }
}
