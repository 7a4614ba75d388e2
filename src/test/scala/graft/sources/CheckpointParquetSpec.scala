package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PARQUET MULTI-PART checkpoints: the file list in bounded columnar
  * parts (`<v>.checkpoint.<i>.<n>.parquet`), the table metadata in a
  * small meta JSON written LAST (its presence witnesses completeness).
  * JSON checkpoints keep reading and writing forever; both formats
  * replay to identical snapshots.
  */
class CheckpointParquetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ckptp").toString

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def logFiles(t: String): Seq[String] =
    fsOf(t).listStatus(new org.apache.hadoop.fs.Path(t, "_graft_log"))
      .map(_.getPath.getName).toSeq

  private def mk(t: String, partRows: Int = 1): Unit =
    LogTable.create(spark, t,
      (0L until 24L).map(i => (i, s"p${i % 3}", i * 2)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(
        LogTable.CkptFormatProp -> "parquet",
        LogTable.CkptPartRowsProp -> partRows.toString))

  test("parquet checkpoint replays to the identical snapshot after " +
    "expiry — files, stats, DV pointers, txns, properties") {
    val t = tmp() + "/t"
    mk(t)
    LogTable.append(spark, t,
      Seq((100L, "p0", 1L)).toDF("k", "p", "v"),
      txn = Some(("appA", 7L))): Unit
    LogTable.deleteWhere(spark, t, col("k") === 3L,
      deletionVectors = true): Unit
    val before = LogTable.snapshot(spark, t)
    assert(before.files.exists(_.dv.isDefined), "need a DV in the fixture")
    LogTable.checkpoint(spark, t): Unit
    val names = logFiles(t)
    assert(names.exists(_.endsWith(".checkpoint.meta.json")))
    val parts = names.filter(_.matches(
      """\d{20}\.checkpoint\.[0-9a-f]{8}\.\d{5}\.\d{5}\.parquet"""))
    assert(parts.size > 1, s"partRows=1 over ${before.files.size} files " +
      s"must split into multiple parts (got ${parts.size})")
    assert(!names.exists(_.endsWith(s"${before.version}.checkpoint.json")),
      "parquet-format table must not also write the JSON checkpoint")
    LogTable.expireLog(spark, t): Unit
    LogTable.dropCachedSnapshots(spark, t)
    val after = LogTable.snapshot(spark, t)
    assert(after.version == before.version)
    assert(after.schemaDdl == before.schemaDdl)
    assert(after.files.sortBy(_.name) == before.files.sortBy(_.name),
      "checkpoint replay must reproduce every file entry bit-for-bit")
    assert(after.txns == before.txns)
    assert(after.properties == before.properties)
    assert(LogTable.read(spark, t).count() == 24L) // 25 rows − 1 DV'd
  }

  test("version identity across formats: the same content checkpointed " +
    "as JSON and as parquet replays to equal snapshots") {
    val (tj, tp) = (tmp() + "/j", tmp() + "/p")
    def seed(t: String, props: Map[String, String]): Unit = {
      LogTable.create(spark, t,
        (0L until 12L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
        Seq("p"), statsCols = Seq("k"), tableProperties = props)
      LogTable.append(spark, t, Seq((50L, "p0", 9L)).toDF("k", "p", "v")): Unit
      LogTable.checkpoint(spark, t): Unit
      LogTable.expireLog(spark, t): Unit
      LogTable.dropCachedSnapshots(spark, t)
    }
    seed(tj, Map.empty)
    seed(tp, Map(LogTable.CkptFormatProp -> "parquet",
      LogTable.CkptPartRowsProp -> "4"))
    val (sj, sp) = (LogTable.snapshot(spark, tj), LogTable.snapshot(spark, tp))
    assert(sj.version == sp.version)
    assert(sj.files.map(f => (f.pmin, f.pmax, f.rows)).sorted ==
      sp.files.map(f => (f.pmin, f.pmax, f.rows)).sorted)
    assert(LogTable.read(spark, tj).agg(sum("v")).as[Long].head() ==
      LogTable.read(spark, tp).agg(sum("v")).as[Long].head())
    // TIMESTAMP AS OF through the parquet checkpoint's CARRIED ts after
    // every commit file expired
    val ts = sp.commitTs
    assert(ts > 0L)
    assert(LogTable.versionAt(spark, tp, ts) == sp.version)
  }

  test("a torn parquet checkpoint (parts without meta) is invisible to " +
    "readers and reclaimed by vacuum") {
    val t = tmp() + "/t"
    mk(t)
    LogTable.checkpoint(spark, t): Unit
    val fs = fsOf(t)
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    // simulate the torn writer: delete the meta, keep the parts
    val meta = fs.listStatus(log).map(_.getPath)
      .filter(_.getName.endsWith(".checkpoint.meta.json")).head
    fs.delete(meta, false): Unit
    LogTable.dropCachedSnapshots(spark, t)
    // commits intact, so the snapshot still replays — WITHOUT the ckpt
    assert(LogTable.snapshot(spark, t).files.nonEmpty)
    assert(LogTable.read(spark, t).count() == 24L)
    // orphaned parts are vacuum's to reclaim
    val n = LogTable.vacuum(spark, t, olderThanMs = 0L, force = true)
    assert(n > 0, "vacuum must reclaim orphaned checkpoint parts")
    assert(!logFiles(t).exists(_.endsWith(".parquet")))
  }

  test("a rival concurrent checkpointer's parts can never mix into the " +
    "replay — the meta pins exact part names, vacuum reclaims the loser") {
    val t = tmp() + "/t"
    mk(t)
    LogTable.checkpoint(spark, t): Unit
    val fs = fsOf(t)
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val before = LogTable.snapshot(spark, t)
    val real = fs.listStatus(log).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    assert(real.size > 1)
    // fabricate the LOSING writer: a complete-looking rival set at the
    // same version under another wid with a DIFFERENT part count —
    // duplicated entries if a reader ever combined them
    val v = before.version
    (1 to 2).foreach { i =>
      val dst = new org.apache.hadoop.fs.Path(log,
        f"$v%020d.checkpoint.deadbeef.$i%05d.${2}%05d.parquet")
      org.apache.hadoop.fs.FileUtil.copy(
        fs, real(i - 1), fs, dst, false, spark.sessionState.newHadoopConf())
    }
    LogTable.expireLog(spark, t): Unit
    LogTable.dropCachedSnapshots(spark, t)
    val after = LogTable.snapshot(spark, t)
    assert(after.files.sortBy(_.name) == before.files.sortBy(_.name),
      "replay must use exactly the advertised parts, never a rival mix")
    assert(LogTable.read(spark, t).count() == 24L)
    // vacuum reclaims the loser's parts, keeps the advertised ones
    LogTable.vacuum(spark, t, olderThanMs = 0L, force = true): Unit
    val left = logFiles(t).filter(_.endsWith(".parquet"))
    assert(left.forall(!_.contains("deadbeef")),
      s"rival parts must be reclaimed, left: $left")
    assert(left.size == real.size, "advertised parts must survive vacuum")
    LogTable.dropCachedSnapshots(spark, t)
    assert(LogTable.read(spark, t).count() == 24L)
  }

  test("a checkpoint whose advertised parts are missing fails LOUD when " +
    "only a rival's complete-looking set remains") {
    val t = tmp() + "/t"
    mk(t)
    LogTable.checkpoint(spark, t): Unit
    LogTable.expireLog(spark, t): Unit
    val fs = fsOf(t)
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val real = fs.listStatus(log).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    val v = LogTable.snapshot(spark, t).version
    // a rival single-part set that passes the listing-time screen
    val dst = new org.apache.hadoop.fs.Path(log,
      f"$v%020d.checkpoint.00000000.${1}%05d.${1}%05d.parquet")
    org.apache.hadoop.fs.FileUtil.copy(
      fs, real.head, fs, dst, false, spark.sessionState.newHadoopConf())
    real.foreach(p => fs.delete(p, false): Unit)
    LogTable.dropCachedSnapshots(spark, t)
    val e = intercept[IllegalStateException](LogTable.snapshot(spark, t))
    assert(e.getMessage.contains("torn"), e.getMessage)
  }

  test("an EMPTY live set checkpoints with zero parts and replays") {
    val t = tmp() + "/t"
    mk(t)
    LogTable.deleteWhere(spark, t, lit(true)): Unit
    LogTable.checkpoint(spark, t): Unit
    LogTable.expireLog(spark, t): Unit
    LogTable.dropCachedSnapshots(spark, t)
    val snap = LogTable.snapshot(spark, t)
    assert(snap.files.isEmpty)
    assert(LogTable.read(spark, t).count() == 0L)
  }
}
