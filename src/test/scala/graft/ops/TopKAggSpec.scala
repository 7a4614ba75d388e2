package graft.ops

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKAgg: determinism across partitionings (the merge path), tie
  * handling, and small-group edge cases.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val topk3 = udaf(new TopKAgg(3), Encoders.product[ScoredId])

  private def run(parts: Int) =
    (1L to 100L).map(i => (s"g${i % 2}", i % 10, i))
      .toDF("g", "score", "id")
      .repartition(parts)
      .groupBy("g").agg(topk3(col("score"), col("id")).as("t"))
      .select(col("g"), col("t.scores").as("scores"), col("t.ids").as("ids"))
      .orderBy("g")
      .collect().map(r => (r.getString(0),
        r.getSeq[Long](1).toList, r.getSeq[Long](2).toList)).toSeq

  test("result is identical under 1, 7, and 32 partitions (merge path)") {
    val a = run(1)
    assert(a == run(7) && a == run(32))
    // ties on score 9 resolve to the SMALLEST ids: g1 holds odd i with
    // i%10==9 → ids 9,19,29,...; top3 = (9,9),(9,19),(9,29)
    val g1 = a.find(_._1 == "g1").get
    assert(g1._2 == List(9L, 9L, 9L) && g1._3 == List(9L, 19L, 29L))
  }

  test("groups smaller than k return their full membership, ordered") {
    val out = Seq(("a", 5L, 1L), ("a", 7L, 2L), ("b", 1L, 9L))
      .toDF("g", "score", "id")
      .groupBy("g").agg(topk3(col("score"), col("id")).as("t"))
      .select(col("g"), col("t.scores"), col("t.ids"))
      .orderBy("g").collect().toSeq
    assert(out == Seq(
      Row("a", Seq(7L, 5L), Seq(2L, 1L)),
      Row("b", Seq(1L), Seq(9L))))
  }

  test("the aggregation combines map-side (partial topk before the exchange)") {
    val df = (1L to 1000L).map(i => (s"g${i % 3}", i, i)).toDF("g", "score", "id")
      .groupBy("g").agg(topk3(col("score"), col("id")).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate runs a partial pass before the shuffle
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
