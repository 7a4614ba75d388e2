package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The snapshot cache: witness-guarded reuse, incremental replay, and —
  * load-bearing — the staleness hazards it must NOT have: a
  * dropped-and-recreated table at the same path, and a foreign writer
  * appending versions behind this JVM's back.
  */
class SnapshotCacheSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-scache").toString

  test("a dropped-and-recreated table at the same path never serves " +
    "the old lineage") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (0L until 10L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    assert(LogTable.snapshot(spark, t).files.nonEmpty)
    assert(LogTable.read(spark, t).count() == 10L) // populate the cache
    // drop the table wholesale and re-create DIFFERENT content at the
    // same path and the same version number
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t), true): Unit
    Thread.sleep(3L) // a distinct witness (mtime) for the new v1
    LogTable.create(spark, t,
      (0L until 7L).map(i => (i, "p9", i * 2)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    val snap = LogTable.snapshot(spark, t)
    assert(snap.version == 1L)
    assert(LogTable.read(spark, t).count() == 7L,
      "the cache served the DROPPED table's snapshot")
    assert(LogTable.readWhere(spark, t, col("p") === "p9").count() == 7L)
  }

  test("versions committed by another writer are visible immediately " +
    "(incremental replay from the cached ancestor)") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (0L until 6L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    assert(LogTable.snapshot(spark, t).version == 1L) // cache v1
    (2 to 5).foreach { i =>
      LogTable.append(spark, t,
        Seq((100L + i, s"p${i % 2}", 1L)).toDF("k", "p", "v")): Unit
      val s = LogTable.snapshot(spark, t)
      assert(s.version == i.toLong)
      assert(s.files.map(_.rows).sum == 6L + (i - 1))
    }
    // repeated snapshots of the same version agree exactly (and under
    // no concurrent eviction are the same cached object — not asserted:
    // suites share the bounded LRU)
    val (s1, s2) = (LogTable.snapshot(spark, t), LogTable.snapshot(spark, t))
    assert(s1.version == s2.version && s1.files == s2.files)
    // time travel to an earlier cached version stays exact
    assert(LogTable.read(spark, t, asOf = Some(2L)).count() == 7L)
  }

  test("checkpoint + expiry interoperate with the cache") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (0L until 6L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    LogTable.append(spark, t, Seq((50L, "p0", 1L)).toDF("k", "p", "v")): Unit
    LogTable.checkpoint(spark, t): Unit
    LogTable.expireLog(spark, t): Unit
    LogTable.append(spark, t, Seq((51L, "p1", 2L)).toDF("k", "p", "v")): Unit
    assert(LogTable.read(spark, t).count() == 8L)
    assert(LogTable.snapshot(spark, t).version == 3L)
    // an expired version still fails loud, cache or not
    intercept[IllegalArgumentException] {
      LogTable.snapshot(spark, t, asOf = Some(1L)): Unit
    }
  }
}
