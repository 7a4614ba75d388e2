package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** UNPARTITIONED log tables — zero partition columns = one partition
  * tuple (the dimension/lookup-table shape). Listing, stats skipping,
  * DVs, merges, compaction, clone and the SQL dialect all key on file
  * identity, so the whole DML + lifecycle surface must run unchanged.
  */
class UnpartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-unpart").toString

  private def mk(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      LogTable.create(spark, dir,
        (0L until 40L).map(i => (i, i * 10, s"g${i % 4}"))
          .toDF("k", "v", "grp"), Nil, statsCols = Seq("k"),
        clusterBy = Seq("k"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("create/read/append/overwrite round-trip with zero partition columns") {
    val dir = tmp() + "/t"
    mk(dir)
    assert(LogTable.snapshot(spark, dir).partitionCols.isEmpty)
    assert(LogTable.read(spark, dir).count() == 40L)
    LogTable.append(spark, dir,
      Seq((100L, 1L, "g0")).toDF("k", "v", "grp")): Unit
    assert(LogTable.read(spark, dir).count() == 41L)
    // stats skipping works off the declared statsCols alone
    val r = LogTable.countWhere(spark, dir, col("k") === 7L)
    assert(r.count == 1L && r.excludedFiles > 0)
    // a provably-empty predicate decides metadata-only
    val none = LogTable.countWhere(spark, dir, col("k") < 0L)
    assert(none.count == 0L && none.scannedFiles == 0)
  }

  test("the DML suite: update, delete, DV delete, merge, compaction, restore") {
    val dir = tmp() + "/t"
    mk(dir)
    LogTable.updateWhere(spark, dir, col("k") === 3L,
      Map("v" -> lit(999L))): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 3L)
      .select("v").as[Long].head() == 999L)
    LogTable.deleteWhere(spark, dir, col("k") === 5L): Unit
    LogTable.deleteWhere(spark, dir, col("k") === 6L,
      deletionVectors = true): Unit
    assert(LogTable.read(spark, dir).count() == 38L)
    LogTable.mergeInto(spark, dir,
      Seq((7L, 70000L, "gX"), (500L, 5L, "gNew")).toDF("k", "v", "grp"),
      Seq("k"))
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert()
      .run(): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 7L)
      .select("v").as[Long].head() == 70000L)
    assert(LogTable.read(spark, dir).count() == 39L)
    // compaction converges (the whole table is one partition value)
    val v = LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 2)
    assert(v > 0)
    assert(LogTable.compactPartitions(spark, dir,
      maxFilesPerPartition = 2) == -1L, "second compaction is a no-op")
    assert(LogTable.read(spark, dir).count() == 39L)
    // restore is metadata-only and readable
    LogTable.restore(spark, dir, 1L): Unit
    assert(LogTable.read(spark, dir).count() == 40L)
  }

  test("lifecycle: schema evolution, rename, clone, vacuum, time travel") {
    val dir = tmp() + "/t"
    mk(dir)
    LogTable.evolveSchema(spark, dir, Seq(
      org.apache.spark.sql.connector.catalog.TableChange.addColumn(
        Array("note"), org.apache.spark.sql.types.StringType, true))): Unit
    LogTable.evolveSchema(spark, dir, Seq(
      org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
        Array("v"), "value"))): Unit
    assert(LogTable.read(spark, dir).columns.toSeq ==
      Seq("k", "value", "grp", "note"))
    val dst = tmp() + "/clone"
    LogTable.clone(spark, dir, dst): Unit
    assert(LogTable.read(spark, dst).count() == 40L)
    LogTable.updateWhere(spark, dir, col("k") < 10L,
      Map("value" -> (col("value") + 1))): Unit
    assert(LogTable.read(spark, dst).agg(sum("value")).as[Long].head() ==
      (0L until 40L).map(_ * 10).sum, "clone pinned at its version")
    val v1 = LogTable.read(spark, dir, asOf = Some(1L))
    assert(v1.columns.toSeq == Seq("k", "v", "grp"))
  }

  test("streaming reads an unpartitioned table (empty partition-column shell)") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir,
      (0L until 6L).map(i => (i, i * 10)).toDF("k", "v"), Nil,
      statsCols = Seq("k"))
    LogTable.append(spark, dir, Seq((100L, 1L)).toDF("k", "v")): Unit
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(classOf[LogTableSourceProvider].getName)
      .option("path", dir).load()
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("k").collect().foreach(r => out.add(r.getLong(0)): Unit)
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L): Unit
    q.stop()
    assert(out.iterator().hasNext)
    val got = scala.jdk.CollectionConverters
      .IteratorHasAsScala(out.iterator()).asScala.toSeq.sorted
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 5L, 100L))
  }

  test("SQL + catalog create without PARTITIONED BY") {
    val dir = tmp() + "/t"
    (0L until 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .createOrReplaceTempView("unpart_base")
    spark.sql(s"CREATE TABLE graft.`$dir` STATS BY (id) " +
      "AS SELECT * FROM unpart_base"): Unit
    assert(LogTable.snapshot(spark, dir).partitionCols.isEmpty)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
      .head().getLong(0) == 10L)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 3"): Unit
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (99, 'x')"): Unit
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dir`")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$dir`").count() >= 3L)
  }
}
