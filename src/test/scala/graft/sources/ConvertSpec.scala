package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT — in-place adoption of an existing parquet directory: one
  * metadata pass + one column-pruned stats scan, zero rewrites. Hive
  * `col=value` layouts adopt with partition values filled from the
  * directory names at read (coalesce — later rewrites bake them into
  * data); flat self-describing layouts adopt directly. Mixed layouts
  * and disagreeing schemas refuse loud.
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-convert").toString

  private def seed = (1L to 60L)
    .map(i => (i, s"v$i", i * 7L, s"p${i % 3}"))
    .toDF("k", "v", "cents", "p")

  test("a hive-partitioned directory adopts in place: read equals the " +
    "raw parquet read, stats skip, partition values prune, and time " +
    "travel to the adopted version keeps working after DML") {
    val dir = tmp() + "/t"
    Sources.writeParquet(seed, dir, partitionBy = Seq("p"))
    val raw = spark.read.parquet(dir)
      .select("k", "v", "cents", "p").as[(Long, String, Long, String)]
      .collect().sorted.toSeq
    val v1 = LogTable.convert(spark, dir, statsCols = Seq("k"))
    assert(v1 == 1L)
    val snap = LogTable.snapshot(spark, dir)
    assert(snap.partitionCols == Seq("p"))
    assert(snap.properties.get(LogTable.ConvertHiveProp).contains("p"))
    // adopted read == raw read, hive partition values filled
    val got = LogTable.read(spark, dir)
      .select("k", "v", "cents", "p").as[(Long, String, Long, String)]
      .collect().sorted.toSeq
    assert(got == raw)
    // per-file stats from the one-pass scan: a k-bound prunes files
    val all = snap.files.size
    assert(all >= 3, s"hive layout must yield >=3 files, got $all")
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    // partition stats came from DIRECTORY values: exactly the p=p1
    // files survive a p-equality prune
    val p1Files = snap.files.count(f => f.pmin == "p1" && f.pmax == "p1")
    assert(p1Files >= 1 && p1Files < all)
    assert(LogTable.readWhere(spark, dir, col("p") === "p1")
      .count() == seed.filter(col("p") === "p1").count())
    val _ = zone
    // DML after adoption: append, predicate delete, time travel to v1
    LogTable.append(spark, dir,
      Seq((100L, "new", 1L, "p0")).toDF("k", "v", "cents", "p")): Unit
    LogTable.deleteWhere(spark, dir, col("k") === 5L): Unit
    assert(LogTable.read(spark, dir).count() == 60L)
    assert(LogTable.read(spark, dir).filter(col("k") === 5L).count() == 0L)
    // the DELETE rewrote its victims through the fill — values baked
    assert(LogTable.read(spark, dir).filter(col("p").isNull).count() == 0L)
    val atV1 = LogTable.read(spark, dir, asOf = Some(1L))
      .select("k", "v", "cents", "p").as[(Long, String, Long, String)]
      .collect().sorted.toSeq
    assert(atV1 == raw, "time travel to the adopted version = raw dir")
    // deletion vectors refuse while convert.hive debt exists
    val e = intercept[IllegalArgumentException] {
      LogTable.deleteWhere(spark, dir, col("k") === 6L,
        deletionVectors = true)
    }
    assert(e.getMessage.contains("convert.hive"), e.getMessage)
  }

  test("a FLAT directory adopts without hive debt: deletion vectors " +
    "work immediately; merges and the change feed run") {
    val dir = tmp() + "/t"
    seed.write.parquet(dir) // flat: all columns in the data
    LogTable.convert(spark, dir, statsCols = Seq("k")): Unit
    val snap = LogTable.snapshot(spark, dir)
    assert(snap.partitionCols.isEmpty)
    assert(!snap.properties.contains(LogTable.ConvertHiveProp))
    assert(LogTable.read(spark, dir).count() == 60L)
    LogTable.deleteWhere(spark, dir, col("k") === 7L,
      deletionVectors = true): Unit
    assert(LogTable.read(spark, dir).count() == 59L)
    val ch = LogTable.readChanges(spark, dir, 1L, 2L)
    assert(ch.filter(col("_change_type") === "delete" && col("k") === 7L)
      .count() == 1L)
  }

  test("refusals: an existing log, disagreeing schemas, non-hive " +
    "nesting; the hive default partition adopts as NULL") {
    val dir = tmp() + "/t"
    Sources.writeParquet(seed, dir, partitionBy = Seq("p"))
    LogTable.convert(spark, dir): Unit
    intercept[IllegalArgumentException] {
      LogTable.convert(spark, dir)
    }
    // disagreeing schemas: two flat files with different columns
    val dir2 = tmp() + "/t2"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir2 + "/part1")
    Seq((2L, 5.0)).toDF("k", "w").write.parquet(dir2 + "/part2")
    // move the part files up to make one flat dir
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("part1", "part2").zipWithIndex.foreach { case (d, i) =>
      fs.listStatus(new org.apache.hadoop.fs.Path(dir2, d))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, j) =>
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(dir2, s"f$i$j.parquet")): Unit
        }
      fs.delete(new org.apache.hadoop.fs.Path(dir2, d), true): Unit
    }
    val e2 = intercept[IllegalArgumentException] {
      LogTable.convert(spark, dir2)
    }
    assert(e2.getMessage.contains("disagree"), e2.getMessage)
    // same NAMES, different TYPES (int32 next to int64) also refuses —
    // the probe compares shapes, not just field-name sets
    val dir2b = tmp() + "/t2b"
    Seq((1, "a")).toDF("k", "v").write.parquet(dir2b + "/part1") // k INT
    Seq((2L, "b")).toDF("k", "v").write.parquet(dir2b + "/part2") // k BIGINT
    val fs2 = new org.apache.hadoop.fs.Path(dir2b)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("part1", "part2").zipWithIndex.foreach { case (d, i) =>
      fs2.listStatus(new org.apache.hadoop.fs.Path(dir2b, d))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (st, j) =>
          fs2.rename(st.getPath,
            new org.apache.hadoop.fs.Path(dir2b, s"g$i$j.parquet")): Unit
        }
      fs2.delete(new org.apache.hadoop.fs.Path(dir2b, d), true): Unit
    }
    val e2b = intercept[IllegalArgumentException] {
      LogTable.convert(spark, dir2b)
    }
    assert(e2b.getMessage.contains("disagree"), e2b.getMessage)
    // non-hive nesting refuses
    val dir3 = tmp() + "/t3"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir3 + "/sub")
    val e3 = intercept[IllegalArgumentException] {
      LogTable.convert(spark, dir3)
    }
    assert(e3.getMessage.contains("col=value"), e3.getMessage)
    // __HIVE_DEFAULT_PARTITION__ no longer refuses — it adopts as a
    // NULL partition value (see the dedicated default-partition test)
    val dir4 = tmp() + "/t4"
    Sources.writeParquet(
      Seq((1L, Option("p0")), (2L, Option.empty[String])).toDF("k", "p"),
      dir4, partitionBy = Seq("p"))
    LogTable.convert(spark, dir4): Unit
    assert(LogTable.read(spark, dir4).filter(col("p").isNull)
      .count() == 1L)
  }

  test("migrateConverted retires the hive debt in one dataChange=false " +
    "commit: values bake into the data, deletion vectors unlock, the " +
    "change feed stays silent, time travel to pre-migration works") {
    val dir = tmp() + "/t"
    Sources.writeParquet(seed, dir, partitionBy = Seq("p"))
    LogTable.convert(spark, dir, statsCols = Seq("k")): Unit
    LogTable.append(spark, dir,
      Seq((300L, "post", 3L, "p1")).toDF("k", "v", "cents", "p")): Unit
    val preMigV = LogTable.snapshot(spark, dir).version
    val mv = LogTable.migrateConverted(spark, dir)
    assert(mv == preMigV + 1)
    val snap = LogTable.snapshot(spark, dir)
    assert(!snap.properties.contains(LogTable.ConvertHiveProp))
    assert(snap.files.forall(f => !f.name.contains("/")),
      "every live file must now sit flat at the root")
    // content identical, values baked into the data
    assert(LogTable.read(spark, dir).count() == 61L)
    assert(LogTable.read(spark, dir).filter(col("p").isNull).count() == 0L)
    // the migration moved rows without changing them — feed silent
    assert(LogTable.readCommitChanges(spark, dir, preMigV, mv)
      .count() == 0L)
    // DVs now work
    LogTable.deleteWhere(spark, dir, col("k") === 9L,
      deletionVectors = true): Unit
    assert(LogTable.read(spark, dir).count() == 60L)
    // time travel behind the migration still fills from directories
    assert(LogTable.read(spark, dir, asOf = Some(preMigV))
      .filter(col("p").isNull).count() == 0L)
    // a second migrate is a no-op
    assert(LogTable.migrateConverted(spark, dir) == -1L)
  }

  test("SQL surface: CONVERT TO GRAFT adopts a directory") {
    val dir = tmp() + "/t"
    Sources.writeParquet(seed, dir, partitionBy = Seq("p"))
    org.apache.spark.sql.GraftBridge.installFunctions(spark,
      new graft.expr.GraftExtensions().apply)
    val v = spark.sql(s"CONVERT TO GRAFT graft.`$dir` STATS BY (k)")
      .collect().head.getLong(0)
    assert(v == 1L)
    assert(LogTable.read(spark, dir).count() == 60L)
    assert(LogTable.snapshot(spark, dir).statsCols == Seq("k"))
  }

  test("the streaming change feed reads a converted hive table with " +
    "partition values filled") {
    val dir = tmp() + "/t"
    Sources.writeParquet(seed, dir, partitionBy = Seq("p"))
    LogTable.convert(spark, dir, statsCols = Seq("k")): Unit
    LogTable.append(spark, dir,
      Seq((200L, "s", 2L, "p1")).toDF("k", "v", "cents", "p")): Unit
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val q = spark.readStream
      .format(classOf[LogTableSourceProvider].getName)
      .option("path", dir).load()
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => buf.add(r): Unit)
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = scala.jdk.CollectionConverters
      .CollectionHasAsScala(buf).asScala.toSeq
    assert(rows.size == 61)
    assert(rows.forall(_.getAs[String]("p") != null),
      "hive partition values must fill through the stream")
  }

  test("a hive layout containing __HIVE_DEFAULT_PARTITION__ adopts: the " +
    "default directory reads as NULL, IS NULL prunes to it, DML and " +
    "post-adoption writes keep the NULL partition coherent") {
    val dir = tmp() + "/t"
    val withNull = (1L to 40L)
      .map(i => (i, s"v$i", i * 7L, if (i % 4 == 0) null else s"p${i % 3}"))
      .toDF("k", "v", "cents", "p")
    Sources.writeParquet(withNull, dir, partitionBy = Seq("p"))
    // Spark wrote the NULL rows under the hive default sentinel
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      dir, "p=__HIVE_DEFAULT_PARTITION__")), "precondition: default dir")
    LogTable.convert(spark, dir, statsCols = Seq("k")): Unit
    // the default directory reads as NULL — never as the sentinel string
    // and never as empty string
    val read = LogTable.read(spark, dir)
    assert(read.filter(col("p").isNull).count() == 10L)
    assert(read.filter(col("p") === "__HIVE_DEFAULT_PARTITION__")
      .count() == 0L)
    assert(read.filter(col("p") === "").count() == 0L)
    // pruning: IS NULL excludes the non-null directories' files
    val cw = LogTable.countWhere(spark, dir, col("p").isNull)
    assert(cw.count == 10L && cw.excludedFiles >= 1, cw.toString)
    // equality never touches the default-partition file
    val eq = LogTable.countWhere(spark, dir, col("p") === "p1")
    val snap = LogTable.snapshot(spark, dir)
    val nullFiles = snap.files.count(_.stats.exists { case (c, st) =>
      c.equalsIgnoreCase("p") && st.nulls > 0 })
    assert(nullFiles >= 1)
    assert(eq.scannedFiles + eq.decidedFiles <= snap.files.size - nullFiles)
    // DML in the NULL partition
    LogTable.updateWhere(spark, dir, col("p").isNull && col("k") % 8 === 0,
      Map("cents" -> (col("cents") + 1L))): Unit
    assert(LogTable.read(spark, dir)
      .filter(col("p").isNull && col("k") % 8 === 0)
      .select(sum(col("cents"))).as[Long].head() ==
      (8L to 40L by 8L).map(_ * 7L + 1L).sum)
    LogTable.deleteWhere(spark, dir, col("p").isNull && col("k") === 4L): Unit
    assert(LogTable.read(spark, dir).count() == 39L)
    // a post-adoption append with NULL partition values lands natively
    LogTable.append(spark, dir,
      Seq((100L, "new", 1L, null.asInstanceOf[String]))
        .toDF("k", "v", "cents", "p")): Unit
    assert(LogTable.read(spark, dir).filter(col("p").isNull).count() == 10L)
  }
}
