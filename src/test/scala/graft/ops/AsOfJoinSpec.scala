package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Left as-of join semantics. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("attaches the latest right row with ts <= left ts per key") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (2L, 3L, "c")).toDF("k", "ts", "ev")
    val right = Seq((1L, 4L, "x"), (1L, 9L, "y"), (2L, 99L, "z")).toDF("k", "rts", "p")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rts")
      .orderBy("k", "ts").collect().toSeq
    assert(out == Seq(
      Row(1L, 5L, "a", "x"),   // 4 <= 5
      Row(1L, 10L, "b", "y"),  // 9 <= 10
      Row(2L, 3L, "c", null))) // 99 > 3 → no match
  }

  test("equal timestamps match (<= semantics); multiple payload columns") {
    val left = Seq((1L, 5L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "x", 42L)).toDF("k", "rts", "p", "q")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "rts").collect().toSeq
    assert(out == Seq(Row(1L, 5L, "x", 42L)))
  }

  test("rejects clashing payload column names") {
    val left = Seq((1L, 5L, "v")).toDF("k", "ts", "p")
    val right = Seq((1L, 4L, "x")).toDF("k", "rts", "p")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, "k", "ts", "rts")
    }
  }
}
