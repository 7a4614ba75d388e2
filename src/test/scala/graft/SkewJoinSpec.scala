package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew handling — the runtime half of the engine's skew story (the
  * compile-time half is explicit salting, e.g. minhashPairs' band-bucket
  * chunks). A join with one dominant key must come out of AQE with the
  * skewed partition split (`skew=true` on the join), not one straggler
  * task doing 90% of the work.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the dominant key of a skewed sort-merge join") {
    val confs = Seq(
      // enough partitions that the median partition size is the small ones
      // (skew detection compares against the median; at the suite default
      // of 2 the hot partition IS the median and nothing is ever skewed)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~95% of fact rows share key 0; payload pads partition bytes over
      // the threshold so the hot partition is unambiguously skewed.
      val facts = spark.range(20000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
          concat_ws("", Seq.fill(8)(md5(col("id").cast("string"))): _*).as("pad"))
      val dims = spark.range(1000).select(col("id").as("k"), lit("d").as("name"))
      val joined = facts.join(dims, "k")
      // execute THIS DataFrame's query execution (a count() would build
      // its own plan tree and leave `joined`'s unexecuted/non-adaptive)
      assert(joined.collect().length == 20000)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join, got:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
