package graft.ops

import scala.collection.immutable.ListMap

import graft.SparkSpec

/** Remaining walk option coverage (`tests/test_data_structures.py:356-556`):
  * sort_keys=false, stable set order, custom writer, collection limits.
  */
class WalkOptionsSpec extends SparkSpec {

  test("sort_keys=false keeps insertion order") {
    val d = ListMap[String, Any]("z" -> 1L, "a" -> 2L)
    assert(Walk(sortKeys = false).lines(d) == Seq("[dict]", "├─ z: 1", "└─ a: 2"))
    assert(Walk(sortKeys = true).lines(d) == Seq("[dict]", "├─ a: 2", "└─ z: 1"))
  }

  test("set_order stable keeps iteration order; sorted sorts") {
    val d = ListMap[String, Any]("s" -> Set[Any]("c", "a", "b"))
    val sorted = Walk().lines(d)
    assert(sorted == Seq("[dict]", "└─ s [set]", "   ├─ [0]: a", "   ├─ [1]: b", "   └─ [2]: c"))
    // stable: order is the set's own iteration order — assert it round-trips
    val stable = Walk(setOrderStable = true).lines(d)
    assert(stable.size == 5 && stable.head == "[dict]")
  }

  test("custom writer receives every line") {
    val buf = Seq.newBuilder[String]
    val d = ListMap[String, Any]("a" -> 1L)
    val collected = Walk()(d, buf += _)
    assert(buf.result() == Seq("[dict]", "└─ a: 1"))
    assert(collected == d)
  }

  test("mixed-type set falls back to string sort") {
    val d = ListMap[String, Any]("s" -> Set[Any](10L, "b", 2L))
    // str() sort: "10" < "2" < "b"
    val lines = Walk().lines(d)
    assert(lines == Seq("[dict]", "└─ s [set]", "   ├─ [0]: 10", "   ├─ [1]: 2", "   └─ [2]: b"))
  }

  test("collection respects both limits together") {
    val d = ListMap[String, Any](
      "xs" -> Seq(ListMap[String, Any]("k" -> 1L), ListMap[String, Any]("k" -> 2L), ListMap[String, Any]("k" -> 3L)))
    val out = Walk(maxDepth = Some(1), maxItemsPerContainer = Some(2))
      .collect(d).asInstanceOf[ListMap[String, Any]]
    assert(out("xs") == Seq.empty[Any]) // depth 1: xs becomes empty list
    val out2 = Walk(maxItemsPerContainer = Some(2)).collect(d).asInstanceOf[ListMap[String, Any]]
    assert(out2("xs").asInstanceOf[Seq[Any]].size == 2)
  }
}
