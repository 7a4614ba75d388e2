package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shallow clone: one metadata commit referencing the source's files,
  * independent divergence (copy-on-write), vacuum safety through the
  * clone registry, DV carry-over, and the SQL statement form.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-clone").toString

  private def mk(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "12")
      LogTable.create(spark, dir,
        (0L until 30L).map(i => (i, i * 10, s"p${i % 3}"))
          .toDF("k", "v", "p"), Seq("p"), statsCols = Seq("k"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("clone references source files without copying; both sides diverge") {
    val root = tmp()
    val src = root + "/src"; val dst = root + "/dst"
    mk(src)
    val srcBytes = LogTable.snapshot(spark, src).files.map(_.bytes).sum
    assert(LogTable.clone(spark, src, dst) == 1L)
    // zero data copied: the clone dir holds only its log + registry
    val copied = new java.io.File(dst).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(copied.isEmpty, "shallow clone must not copy data files")
    assert(LogTable.read(spark, dst).count() == 30L)
    assert(LogTable.snapshot(spark, dst).files.forall(_.name.contains("/")),
      "clone entries reference the source absolutely")
    assert(LogTable.snapshot(spark, dst).files.map(_.bytes).sum == srcBytes)
    // divergence: delete on the clone leaves the source whole…
    LogTable.deleteWhere(spark, dst, col("k") < 10): Unit
    assert(LogTable.read(spark, dst).count() == 20L)
    assert(LogTable.read(spark, src).count() == 30L)
    // …and an update on the source leaves the clone at ITS state
    LogTable.updateWhere(spark, src, col("k") === 20L,
      Map("v" -> lit(9999L))): Unit
    assert(LogTable.read(spark, dst).filter(col("k") === 20L)
      .select("v").as[Long].head() == 200L,
      "the clone must not see source writes after the clone point")
    // provenance + no MV registry inherited
    val props = LogTable.snapshot(spark, dst).properties
    assert(props.get("clone.source").exists(_.endsWith("/src")))
    assert(!props.contains("mv.autorefresh"))
  }

  test("source vacuum protects files a live clone references; dead clones release") {
    val root = tmp()
    val src = root + "/src"; val dst = root + "/dst"
    mk(src)
    LogTable.clone(spark, src, dst): Unit
    // the source rewrites a partition: its old files become vacuum
    // candidates — but the clone still reads them
    LogTable.updateWhere(spark, src, col("p") === "p1",
      Map("v" -> (col("v") + 1))): Unit
    Thread.sleep(5L)
    LogTable.vacuum(spark, src, 0L, force = true): Unit
    assert(LogTable.read(spark, dst).count() == 30L,
      "vacuuming the source must not break a registered clone")
    assert(LogTable.read(spark, dst).agg(sum("v")).as[Long].head() ==
      (0L until 30L).map(_ * 10).sum, "clone reads the PRE-update files")
    // drop the clone; the next source vacuum reaps the marker and the
    // now-unreferenced files
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(): Unit
    }
    deleteRec(new java.io.File(dst))
    Thread.sleep(5L)
    // a marker whose destination is gone sits in the pending-clone grace
    // window (it could be a clone mid-flight) — age it out so this
    // vacuum treats it as a genuinely dead clone
    new java.io.File(src, "_graft_clones").listFiles().foreach(m =>
      assert(m.setLastModified(
        System.currentTimeMillis() - LogTable.ClonePendingGraceMs - 1000L)))
    val reclaimed = LogTable.vacuum(spark, src, 0L, force = true)
    assert(reclaimed > 0, "a dead clone's references must release files")
    assert(new java.io.File(src, "_graft_clones").listFiles().isEmpty,
      "dead clone markers are reaped")
    assert(LogTable.read(spark, src).count() == 30L)
  }

  test("clone carries deletion vectors; compaction re-localizes the clone") {
    val root = tmp()
    val src = root + "/src"; val dst = root + "/dst"
    mk(src)
    // a DV delete on the source BEFORE cloning: the clone must apply
    // the same vector through its absolute sidecar reference
    LogTable.deleteWhere(spark, src, col("k") === 5L,
      deletionVectors = true): Unit
    LogTable.clone(spark, src, dst): Unit
    assert(LogTable.read(spark, dst).count() == 29L)
    assert(LogTable.snapshot(spark, dst).files.exists(_.dv.isDefined))
    // OPTIMIZE on the clone rewrites locally and releases the references
    LogTable.compactPartitions(spark, dst, maxFilesPerPartition = 1): Unit
    assert(LogTable.snapshot(spark, dst).files.forall(!_.name.contains("/")),
      "compaction re-localizes every referenced file")
    assert(LogTable.read(spark, dst).count() == 29L)
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE ... (path form)") {
    val root = tmp()
    val src = root + "/src"; val dst = root + "/dst"
    mk(src)
    val v = spark.sql(
      s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`")
      .head().getLong(0)
    assert(v == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$dst`")
      .as[Long].head() == 30L)
    // cloning onto an existing table fails loud
    intercept[IllegalArgumentException] {
      LogTable.clone(spark, src, dst)
    }
  }

  test("SQL: RESTORE TABLE ... TO VERSION AS OF undoes a bad delete") {
    val root = tmp()
    val t = root + "/t"
    mk(t)
    LogTable.deleteWhere(spark, t, col("k") < 25): Unit
    assert(LogTable.read(spark, t).count() == 5L)
    val v = spark.sql(
      s"RESTORE TABLE graft.`$t` TO VERSION AS OF 1").head().getLong(0)
    assert(v == 3L, "restore is a NEW commit, history preserved")
    assert(LogTable.read(spark, t).count() == 30L)
    // already-there restores answer -1 without committing
    assert(spark.sql(s"RESTORE TABLE graft.`$t` TO VERSION AS OF 3")
      .head().getLong(0) == -1L)
  }
}
