package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-only: print the final adaptive plan of a query and count scans vs
  * reused exchanges — validates that claimed ReuseExchange actually fires
  * at runtime (static explain can't show AQE stage reuse).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val name = args.headOption.getOrElse("q16_minhash_neardup")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    println(s"=== $name final plan stats ===")
    println("FileScan:        " + "FileScan".r.findAllIn(fin).size)
    println("ReusedExchange:  " + "ReusedExchange".r.findAllIn(fin).size)
    println("Exchange (all):  " + "Exchange".r.findAllIn(fin).size)
    if (args.contains("--full")) fin.linesIterator.foreach(l => println(l.take(160)))
    spark.stop()
  }
}
