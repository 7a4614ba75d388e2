package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.scale.Multimodal

/** The graft-shards DataSource V2: parity with the mapPartitions reader,
  * one input partition per shard, and content pruning pushed into the
  * scan.
  */
class ShardSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeShards(): (String, Int) = {
    val dir = Files.createTempDirectory("graft-dsv2").toString + "/shards"
    val docs = (0L until 64L).map(i => (i, ("payload-" + i) * 40)).toDF("id", "text")
      .repartition(2)
    // small cap → several shards per partition, so partition planning is
    // actually exercised
    Multimodal.exportPayloadShards(docs, "id", col("text").cast("binary"),
      dir, maxShardBytes = 4L << 10)
    val n = new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar"))
    assert(n > 2, s"expected several shards, got $n")
    (dir, n)
  }

  test("dsv2 rows match the mapPartitions reader; one partition per shard") {
    val (dir, nShards) = writeShards()
    val dsv2 = spark.read.format("graft-shards").load(dir)
    val legacy = Multimodal.readPayloadShards(spark, dir)
    val key = Seq("name")
    val a = dsv2.select(col("name"), md5(col("content")).as("m"))
      .orderBy(key.map(col): _*).collect().toSeq
    val b = legacy.select(col("name"), md5(col("content")).as("m"))
      .orderBy(key.map(col): _*).collect().toSeq
    assert(a == b && a.size == 64)
    assert(dsv2.rdd.getNumPartitions == nShards)
  }

  test("metadata-only projection prunes content out of the scan") {
    val (dir, _) = writeShards()
    val names = spark.read.format("graft-shards").load(dir).select("name")
    names.collect()
    val scanLine = names.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("graft-shards"), scanLine)
    assert(!scanLine.contains("content"), s"content not pruned: $scanLine")
    // and a pure count plans the empty projection without error
    assert(spark.read.format("graft-shards").load(dir).count() == 64)
  }

  test("custom scan metrics: entries counted, pruned bytes accounted") {
    val (dir, _) = writeShards()
    def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = root.collectFirst { case b: BatchScanExec => b }.get
      scan.metrics.map { case (k, m) => k -> m.value }
    }
    val pruned = scanMetrics(
      spark.read.format("graft-shards").load(dir).select("name"))
    assert(pruned("entriesRead") == 64L, pruned)
    assert(pruned("bytesSkipped") > 0L, pruned)
    val full = scanMetrics(
      spark.read.format("graft-shards").load(dir).select("name", "content"))
    assert(full("entriesRead") == 64L && full("bytesSkipped") == 0L, full)
  }

  test("missing directory plans zero partitions, .tmp orphans are excluded") {
    val empty = Files.createTempDirectory("graft-dsv2").toString + "/none"
    assert(spark.read.format("graft-shards").load(empty).count() == 0)
    val (dir, _) = writeShards()
    // plant a crashed-attempt orphan; it must not be planned
    val orphan = new java.io.File(dir, "shard-99999-00000.tar.7.tmp")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    assert(spark.read.format("graft-shards").load(dir).count() == 64)
  }
}
