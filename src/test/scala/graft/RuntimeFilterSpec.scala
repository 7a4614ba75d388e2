package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the 100 TB lever for selective
  * fact-to-fact joins that cannot broadcast: Spark's InjectRuntimeFilter
  * builds a bloom filter from the small (filtered) join side at runtime
  * and pushes `bloom_filter_might_contain` onto the probe-side SCAN, so
  * a shuffle join reads only rows that can possibly match instead of the
  * whole fact table. The thresholds exist because the filter only pays
  * off when the probe side is big (default: probe scan >= 10 GB,
  * build side <= 10 MB) — at test scale we drop the probe floor to 0 to
  * pin that OUR join shapes qualify structurally (equi-join below a
  * selective filter, no broadcast): if a refactor broke that shape
  * (e.g. a non-deterministic projection between filter and join blocks
  * the subquery injection), this spec catches it at any scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective fact-fact shuffle join gets a runtime bloom filter on the probe scan") {
    val dir = "/root/testdata/sf0.001"
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val lineitem = Tables(spark, dir, "lineitem")
      // Derive the selectivity cut from the live data (top ~2% by price)
      // so a testdata regeneration with a different price scale can
      // neither fail the join-rows assert nor blow the 10 MB bloom
      // creation threshold — the spec pins the plan SHAPE, not a price.
      val cut = Tables(spark, dir, "orders")
        .stat.approxQuantile("o_totalprice", Array(0.98), 0.0).head
      val orders = Tables(spark, dir, "orders")
        .filter(col("o_totalprice") >= cut) // selective, provably non-empty
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        "runtime bloom filter not injected on the probe side:\n" + plan.take(4000))
      // and it still computes the right join
      assert(joined.count() > 0)
    }
  }
}
