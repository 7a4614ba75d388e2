package graft.ops

import scala.collection.immutable.ListMap

import graft.SparkSpec

/** D2 walk behavior, porting the reference docstring examples and unit
  * tests (`data_structures.py:286-317`, `tests/test_data_structures.py:278-556`).
  */
class WalkSpec extends SparkSpec {

  private val data = ListMap[String, Any](
    "a" -> 1L, "b" -> Seq(2L, 3L), "c" -> ListMap[String, Any]("d" -> "x"))

  test("basic tree with types and lengths") {
    val lines = Walk(showTypes = true, showLengths = true).lines(data)
    assert(lines == Seq(
      "[dict len=3]",
      "├─ a: 1 (int)",
      "├─ b [list len=2]",
      "│  ├─ [0]: 2 (int)",
      "│  └─ [1]: 3 (int)",
      "└─ c [dict len=1]",
      "   └─ d: x (str)"))
  }

  test("max_depth shows container tags but not contents") {
    val complex = ListMap[String, Any](
      "users" -> Seq(
        ListMap[String, Any]("id" -> 1L, "name" -> "Alice", "roles" -> Seq("admin", "user")),
        ListMap[String, Any]("id" -> 2L, "name" -> "Bob", "roles" -> Seq("user"))),
      "settings" -> ListMap[String, Any]("theme" -> "dark", "notifications" -> true))
    // NOTE: the reference docstring (`data_structures.py:312-317`) omits the
    // settings leaves, but its CODE (and test_walk_with_max_depth) prints
    // leaf children at the boundary — containers stop recursing, leaves show.
    val lines = Walk(maxDepth = Some(2), showLengths = true).lines(complex)
    assert(lines == Seq(
      "[dict len=2]",
      "├─ settings [dict len=2]",
      "│  ├─ notifications: True",
      "│  └─ theme: dark",
      "└─ users [list len=2]",
      "   ├─ [0] [dict len=3]",
      "   └─ [1] [dict len=3]"))
  }

  test("collect applies max_items to sequences, never mappings") {
    val d = ListMap[String, Any]("xs" -> Seq(1L, 2L, 3L, 4L), "k1" -> 1L, "k2" -> 2L, "k3" -> 3L)
    val out = Walk(maxItemsPerContainer = Some(2)).collect(d)
      .asInstanceOf[ListMap[String, Any]]
    assert(out("xs") == Seq(1L, 2L))
    assert(out.keySet == Set("xs", "k1", "k2", "k3"))
  }

  test("collect replaces containers with empty at max_depth") {
    val d = ListMap[String, Any]("m" -> ListMap[String, Any]("x" -> 1L), "s" -> Seq(1L))
    val out = Walk(maxDepth = Some(1)).collect(d).asInstanceOf[ListMap[String, Any]]
    assert(out("m") == ListMap.empty[String, Any])
    assert(out("s") == Seq.empty[Any])
  }

  test("quote_strings escapes; truncate_value_len adds ellipsis") {
    assert(Walk(quoteStrings = true).lines("""say "hi"""") == Seq("\"say \\\"hi\\\"\""))
    assert(Walk(truncateValueLen = Some(5)).lines("hello world") == Seq("hello…"))
    val d = ListMap[String, Any]("s" -> "hello world")
    assert(Walk(truncateValueLen = Some(5)).lines(d) == Seq("[dict]", "└─ s: hello…"))
  }

  test("sets render sorted with artificial indices; bool/None render Python-style") {
    val d = ListMap[String, Any]("st" -> Set[Any](3L, 1L, 2L), "f" -> false, "n" -> null)
    val lines = Walk(showLengths = true).lines(d)
    assert(lines == Seq(
      "[dict len=3]",
      "├─ f: False",
      "├─ n: None",
      "└─ st [set size=3]",
      "   ├─ [0]: 1",
      "   ├─ [1]: 2",
      "   └─ [2]: 3"))
  }

  test("fromRow converts a Spark Row to the dynamic form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1).toDF("i").select(
      lit(1L).as("a"), array(lit(2L), lit(3L)).as("b"),
      struct(lit("x").as("d")).as("c"))
    val item = Walk.fromRow(df.head(), df.schema)
    val lines = Walk(showTypes = true, showLengths = true).lines(item)
    assert(lines.head == "[dict len=3]")
    assert(lines.contains("│  ├─ [0]: 2 (int)"))
    assert(lines.contains("   └─ d: x (str)"))
  }
}
