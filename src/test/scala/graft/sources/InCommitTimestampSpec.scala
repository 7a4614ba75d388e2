package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-commit timestamps: the version's wall clock travels IN the commit
  * bytes, monotone-clamped against the parent, so `TIMESTAMP AS OF`,
  * history and the monotonicity of time itself survive storage-layer
  * mtime churn (object-store copies, checkpoint rewrites) and
  * same-millisecond commit bursts.
  */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ict").toString

  private def mk(dir: String): Unit =
    LogTable.create(spark, dir,
      (0L until 12L).map(i => (i, s"p${i % 2}", i * 10L)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))

  private def ictOf(dir: String, v: Long): Long =
    LogTable.snapshot(spark, dir, Some(v)).commitTs

  test("rapid commits carry STRICTLY increasing in-commit timestamps") {
    val t = tmp()
    mk(t)
    // a burst of metadata commits lands inside one wall millisecond on
    // a fast box — the clamp must separate them
    (1 to 4).foreach { i =>
      LogTable.setProperties(spark, t, Map("burst" -> i.toString)): Unit
    }
    val ts = (1L to 5L).map(ictOf(t, _))
    assert(ts.forall(_ > 0L), "every commit carries an in-commit ts")
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b },
      s"in-commit timestamps must be strictly increasing: $ts")
  }

  test("versionAt resolves from in-commit timestamps, exactly") {
    val t = tmp()
    mk(t)
    LogTable.append(spark, t,
      Seq((100L, "p0", 5L)).toDF("k", "p", "v")): Unit
    LogTable.append(spark, t,
      Seq((101L, "p1", 6L)).toDF("k", "p", "v")): Unit
    (1L to 3L).foreach { v =>
      val at = ictOf(t, v)
      assert(LogTable.versionAt(spark, t, at) == v,
        s"versionAt(ict($v)) must be $v")
      // one millisecond before a version's ts resolves to its parent
      if (v > 1L)
        assert(LogTable.versionAt(spark, t, at - 1L) == v - 1L)
    }
    intercept[IllegalArgumentException] {
      LogTable.versionAt(spark, t, ictOf(t, 1L) - 1L): Unit
    }
  }

  test("a checkpoint CARRIES the version's ts — time travel by " +
    "timestamp survives log expiry and the rewrite's own mtime") {
    val t = tmp()
    mk(t)
    LogTable.append(spark, t, Seq((100L, "p0", 5L)).toDF("k", "p", "v")): Unit
    val v2ts = ictOf(t, 2L)
    Thread.sleep(3L)
    LogTable.append(spark, t, Seq((101L, "p1", 6L)).toDF("k", "p", "v")): Unit
    val v3ts = ictOf(t, 3L)
    // checkpoint at v3, expire v1..v3 commit files — the checkpoint file
    // is brand new (mtime = now), but it must witness v3 at v3's OWN ts
    assert(LogTable.checkpoint(spark, t) == 3L)
    assert(LogTable.expireLog(spark, t) == 3)
    LogTable.append(spark, t, Seq((102L, "p0", 7L)).toDF("k", "p", "v")): Unit
    assert(LogTable.versionAt(spark, t, v3ts) == 3L)
    assert(LogTable.read(spark, t,
      asOf = Some(LogTable.versionAt(spark, t, v3ts))).count() == 14L)
    // v2's commit file is gone — its window now resolves to nothing
    // readable before v3, and fails loud rather than serving v3
    intercept[IllegalArgumentException] {
      LogTable.versionAt(spark, t, v2ts): Unit
    }
    // monotonicity bridges the expiry: the post-expiry commit's ts
    // still clamps above the checkpoint's carried ts
    assert(ictOf(t, 4L) > v3ts)
  }

  test("history reports the in-commit clock and it is the SQL " +
    "TIMESTAMP AS OF clock") {
    val t = tmp()
    mk(t)
    LogTable.append(spark, t, Seq((100L, "p0", 5L)).toDF("k", "p", "v")): Unit
    val h = LogTable.history(spark, t)
      .select("version", "commit_time").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(h(1L) == ictOf(t, 1L) && h(2L) == ictOf(t, 2L))
    // the SQL front door resolves the same instant to the same version
    val iso = new java.sql.Timestamp(h(1L)).toInstant.toString
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` TIMESTAMP AS OF '$iso'")
      .head().getLong(0)
    assert(n == 12L)
  }

  test("the CDF table functions take TIMESTAMP bounds on the same clock") {
    val t = tmp()
    mk(t)
    LogTable.append(spark, t, Seq((100L, "p0", 5L)).toDF("k", "p", "v")): Unit
    LogTable.append(spark, t, Seq((101L, "p1", 6L)).toDF("k", "p", "v")): Unit
    def iso(v: Long) = new java.sql.Timestamp(ictOf(t, v)).toInstant.toString
    // (v1, v3] by timestamp = both appended rows
    val n = spark.sql(s"SELECT count(*) AS n FROM graft_changes('$t', " +
      s"TIMESTAMP'${iso(1L)}', TIMESTAMP'${iso(3L)}') " +
      "WHERE _change_type = 'insert'").head().getLong(0)
    assert(n == 2L, s"timestamp-bounded CDF saw $n inserts")
    // mixed bounds: version from, timestamp to
    val n2 = spark.sql(s"SELECT count(*) AS n FROM graft_net_changes('$t', " +
      s"2, TIMESTAMP'${iso(3L)}', 'k')").head().getLong(0)
    assert(n2 == 1L)
  }
}
