package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join coverage: the runtime lever for the hot-key joins the
  * engine cannot pre-salt (ad-hoc fact-fact joins on organically skewed
  * keys — at 100 TB one viral user/document key can hold 1000× the median
  * partition). The engine's own skew-prone paths pre-salt deterministically
  * (LSH buckets, verification pairs); this spec pins that the PLAIN join
  * shapes the library emits stay eligible for Spark's adaptive skew split,
  * by building a synthetic skewed join and asserting AQE actually marks
  * the skewed side split at runtime (`isSkew=true` in the final adaptive
  * plan) while the result stays correct. Thresholds are dialed down so a
  * toy dataset exhibits "skew" — the assertion is about plan mechanics,
  * not data volume.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a shuffled equi-join at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      // enough partitions that the median is a NORMAL partition — with
      // the test session's 2, the hot partition IS the median and can
      // never exceed factor x itself
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // toy-scale dials: any partition over ~16 KB and 1.1x the median
      // counts as skewed, so the planted hot key trips the optimization
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384") {
      // hot key 0 carries 50k left rows; keys 1..50 a handful each
      val left = spark.range(0, 50000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(1, 51).select(col("id").as("k"), col("id").as("v")))
      val right = spark.range(0, 51).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("tag"))
      val joined = left.join(right, "k")
      // execute THIS dataframe's plan (count() would plan a separate
      // aggregate tree and leave joined's adaptive plan un-run)
      assert(joined.collect().length == 50000 + 50)
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.nonEmpty, "expected an adaptive plan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true") &&
        finalPlan.contains("AQEShuffleRead skewed"),
        "AQE did not mark the hot partition skew-split:\n" + finalPlan.take(4000))
    }
  }
}
