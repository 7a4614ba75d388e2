package graft
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
class Q86PlanProbe extends SparkSpec {
  private def plan(n: String): String = {
    val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  test("probe") {
    for (n <- Seq("q86_token_quantiles", "q87_source_cap")) {
      val p = plan(n)
      println(s"=== $n grouplimit=${p.contains("WindowGroupLimit")} exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size}")
    }
  }
}
