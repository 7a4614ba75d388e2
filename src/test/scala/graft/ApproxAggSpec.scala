package graft

import org.apache.spark.sql.functions._

/** The approximate aggregates used instead of exact ones at 100 TB:
  * approx_count_distinct (HLL++ sketch, fixed-KB partial state per group)
  * and approx percentiles. No cross-engine oracle can hash-match a sketch,
  * so the bound vs the exact answer is pinned here (q43 carries the exact
  * oracle-checked counterpart).
  */
class ApproxAggSpec extends SparkSpec {

  private lazy val events = Tables(spark, "/root/testdata/sf0.001", "events")

  test("approx_count_distinct lands within its rsd of exact") {
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.05).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact median") {
    val row = events.agg(
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(value, 0.5)").as("exact")).head()
    val (approx, exact) = (row.getDouble(0), row.getDouble(1))
    // accuracy=10000 ⇒ rank error ≤ n/10000; values are dense so the
    // approximation must land within a tight value band of the median.
    assert(math.abs(approx - exact) <= math.max(0.05 * math.abs(exact), 1e-6),
      s"approx $approx vs exact $exact")
  }
}
