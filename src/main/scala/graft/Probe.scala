package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.scale.Dedup

/** Dev-only stage profiler for the MinHash-LSH pipeline (q16): bench-like
  * conditions (sf0.001 warm-up, then one timed run) with per-stage wall /
  * executor-run times from a listener.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s).getOrElse(-1L)
        stages += ((i.stageId, wall, i.taskMetrics.executorRunTime, i.numTasks))
      }
    })

    Dedup.minhashPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3, 48, 6, 0.9).count()
    Thread.sleep(500)
    stages.clear()

    val t0 = System.nanoTime()
    val n = Dedup.minhashPairs(Tables(spark, sfDir, "documents"),
      "doc_id", "text", 3, 48, 6, 0.9).count()
    val tot = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"TOTAL $tot%.2f s rows=$n stages=${stages.size}")
    stages.sortBy(-_._2).take(15).foreach { case (id, wall, run, nt) =>
      println(f"stage $id%4d wall=${wall / 1e3}%7.2f s run=${run / 1e3}%8.2f s tasks=$nt%4d")
    }
    spark.stop()
  }
}
