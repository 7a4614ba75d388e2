package graft

import graft.queries.ScaleQueries

/** The within-value md5-prefix sub-split (the q83 salting discipline
  * applied to exact-value order statistics) must be invisible in the
  * output: the sub-bucket id is a prefix-range of the (hk, doc_id)
  * ordering key, so merging sub-partitions in __sub order reproduces the
  * unsplit order exactly. These specs force EVERY value bucket through
  * the maximum fan-out (cap = 1) and assert bit-identical results against
  * the never-split form (cap = Long.MaxValue) — the property that lets
  * the registered queries keep one oracle for any cap.
  */
class SaltedOrderStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q86: max 256-way sub-split leaves the per-source quantiles bit-identical") {
    val ref = ScaleQueries.tokenQuantiles(spark, sf, Long.MaxValue)
      .collect().map(_.toString).toSet
    val salted = ScaleQueries.tokenQuantiles(spark, sf, 1L)
      .collect().map(_.toString).toSet
    assert(ref == salted, "sub-split changed the quantile output")
  }

  test("q91: sub-split is order-invisible — survivor set AND tokens_before identical at any fan-out") {
    val ref = ScaleQueries.tokenBudgetCut(spark, sf, Long.MaxValue)
      .collect().map(_.toString).toSet
    val salted = ScaleQueries.tokenBudgetCut(spark, sf, 1L)
      .collect().map(_.toString).toSet
    assert(ref == salted, "sub-split changed the budget-cut output")
  }

  test("both sub-offset strategies (pre-agg vs raw-row) are bit-identical at max fan-out") {
    // the strategy dial (OrderStatsPreAgg) is a pure performance trade:
    // whichever way the sub-offsets are derived, every emitted row must
    // match — forced through max fan-out so the sub-split path is live
    for (cap <- Seq(Long.MaxValue, 1L)) {
      val q86a = ScaleQueries.tokenQuantiles(spark, sf, cap, preAgg = true)
        .collect().map(_.toString).toSet
      val q86b = ScaleQueries.tokenQuantiles(spark, sf, cap, preAgg = false)
        .collect().map(_.toString).toSet
      assert(q86a == q86b, s"q86 strategies diverged at cap=$cap")
      val q91a = ScaleQueries.tokenBudgetCut(spark, sf, cap, preAgg = true)
        .collect().map(_.toString).toSet
      val q91b = ScaleQueries.tokenBudgetCut(spark, sf, cap, preAgg = false)
        .collect().map(_.toString).toSet
      assert(q91a == q91b, s"q91 strategies diverged at cap=$cap")
    }
  }
}
