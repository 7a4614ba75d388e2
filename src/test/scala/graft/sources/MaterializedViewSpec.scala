package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental materialized-view maintenance: every refresh must leave
  * the view EXACTLY equal to a from-scratch recompute of the same
  * aggregate over the base table's current state — inserts, updates,
  * deletes, rider-only windows, restarts included.
  */
class MaterializedViewSpec extends SparkSpec {
  import MaterializedView._

  private def tmp() = Files.createTempDirectory("graft-mv").toString

  private def mkBase(path: String, n: Int): Unit = {
    import spark.implicits._
    val df = (1 to n).map { i =>
      (i.toLong, s"g${i % 5}", (i % 3).toLong, if (i % 7 == 0) None else Some(i.toLong * 10),
        0L, "U")
    }.toDF("id", "grp", "part", "x", "ver", "op")
    LogTable.create(spark, path, df, Seq("part"), Seq("id")): Unit
  }

  private def upd(rows: Seq[(Long, String, Long, Option[Long], Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "grp", "part", "x", "ver", "op")
  }

  private def recompute(base: String): DataFrame =
    LogTable.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"), count(col("x")).as("n_x"),
        sum(col("x")).as("sum_x"), avg(col("x")).as("avg_x"))

  private def assertSame(mv: String, base: String): Unit = {
    val got = MaterializedView.read(spark, mv)
    val want = recompute(base)
    assert(got.schema.fieldNames.toSeq ===
      Seq("grp", "n", "n_x", "sum_x", "avg_x"))
    val diff = got.unionByName(want).except(got.intersect(want))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"view != recompute:\n${diff.collect().mkString("\n")}")
    assert(got.count() === want.count())
  }

  private def define(mv: String, base: String, nBuckets: Int = 4): Unit =
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MvCount("n"), MvCountCol("n_x", "x"), MvSum("sum_x", "x"),
        MvAvg("avg_x", "x")), nBuckets): Unit

  test("initial load equals full recompute (NULL inputs included)") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 100)
    define(mv, base)
    assert(MaterializedView.refreshedVersion(spark, mv) === 0L)
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assert(MaterializedView.refreshedVersion(spark, mv) === 1L)
    assertSame(mv, base)
  }

  test("refresh is a no-op when up to date") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 20)
    define(mv, base)
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assert(MaterializedView.refresh(spark, mv) === -1L)
  }

  test("incremental refresh folds inserts, updates and deletes exactly") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 100)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    // window 1: updates (change x), inserts (new ids), a delete
    LogTable.upsert(spark, base, upd(Seq(
      (3L, "g3", 0L, Some(999L), 1L, "U"),      // update non-null -> non-null
      (7L, "g2", 1L, Some(70L), 1L, "U"),       // update null -> non-null
      (10L, "g0", 1L, None, 1L, "U"),           // update non-null -> null
      (101L, "g1", 2L, Some(5L), 1L, "U"),      // insert
      (102L, "gNEW", 0L, None, 1L, "U"),        // insert: brand-new group
      (4L, "g4", 1L, Some(40L), 1L, "D"))),     // delete
      Seq("id"), Seq("ver"), "op"): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assertSame(mv, base)
    // window 2: kill an entire group (gNEW has exactly one row)
    LogTable.upsert(spark, base, upd(Seq(
      (102L, "gNEW", 0L, None, 2L, "D"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertSame(mv, base)
    assert(MaterializedView.read(spark, mv)
      .filter(col("grp") === "gNEW").count() === 0L,
      "emptied group must be deleted from the state table")
  }

  test("rider-only window (compaction) advances the watermark, writes no groups") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 60)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    val mvVerBefore = LogTable.latestVersion(spark, mv)
    LogTable.compactPartitions(spark, base, maxFilesPerPartition = 1): Unit
    val baseHead = LogTable.latestVersion(spark, base)
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assert(MaterializedView.refreshedVersion(spark, mv) === baseHead)
    val hist = LogTable.history(spark, mv)
      .filter(col("version") > mvVerBefore)
      .agg(sum(col("rows_added"))).collect()(0)
    assert(hist.isNullAt(0) || hist.getLong(0) == 0L,
      "rider-only refresh must write zero state rows")
    assertSame(mv, base)
  }

  test("same-window retry is exactly-once (txn watermark)") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 30)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    LogTable.upsert(spark, base, upd(Seq(
      (1L, "g1", 1L, Some(1000L), 1L, "U"))),
      Seq("id"), Seq("ver"), "op"): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    // a second refresh of the same window must be skipped, not re-applied
    assert(MaterializedView.refresh(spark, mv) === -1L)
    assertSame(mv, base)
  }

  test("refresh rewrites only touched buckets") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 200)
    define(mv, base, nBuckets = 8)
    MaterializedView.refresh(spark, mv): Unit
    val before = LogTable.snapshot(spark, mv)
    // touch exactly one group -> exactly one bucket
    LogTable.upsert(spark, base, upd(Seq(
      (2L, "g2", 0L, Some(123L), 1L, "U"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    val after = LogTable.snapshot(spark, mv)
    val afterNames = after.files.map(_.name).toSet
    val spared = before.files.count(f => afterNames.contains(f.name))
    assert(spared > 0 && before.files.size - spared <= 1,
      s"one-group refresh rewrote ${before.files.size - spared} buckets")
    assertSame(mv, base)
  }

  test("float/double aggregates are rejected at define time") {
    val base = tmp(); val mv = tmp() + "/mv"
    import spark.implicits._
    val df = Seq((1L, "a", 0L, 1.5, 0L, "U"))
      .toDF("id", "grp", "part", "d", "ver", "op")
    LogTable.create(spark, base, df, Seq("part")): Unit
    val e = intercept[IllegalArgumentException] {
      MaterializedView.define(spark, mv, base, Seq("grp"),
        Seq(MvSum("s", "d")))
    }
    assert(e.getMessage.contains("not exactly retractable"))
  }

  test("decimals without accumulator headroom are rejected at define time") {
    val base = tmp(); val mv = tmp() + "/mv"
    import spark.implicits._
    val df = Seq((1L, "a", 0L, BigDecimal("1.5"), 0L, "U"))
      .toDF("id", "grp", "part", "amt", "ver", "op") // scala default: (38,18)
    LogTable.create(spark, base, df, Seq("part")): Unit
    val e = intercept[IllegalArgumentException] {
      MaterializedView.define(spark, mv, base, Seq("grp"),
        Seq(MvSum("s", "amt")))
    }
    assert(e.getMessage.contains("headroom"))
  }

  test("NULL group keys fail loud at refresh") {
    val base = tmp(); val mv = tmp() + "/mv"
    import spark.implicits._
    val df = Seq((1L, Option("a"), 0L, 1L, 0L, "U"),
      (2L, Option.empty[String], 0L, 2L, 0L, "U"))
      .toDF("id", "grp", "part", "x", "ver", "op")
    LogTable.create(spark, base, df, Seq("part")): Unit
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MvCount("n"))): Unit
    val e = intercept[Exception] {
      MaterializedView.refresh(spark, mv): Unit
    }
    assert(e.getMessage.contains("NULL group key") ||
      e.getCause != null && e.getCause.getMessage.contains("NULL group key"))
  }

  test("decimal sums stay exact through update churn") {
    val base = tmp(); val mv = tmp() + "/mv"
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"g${i % 3}", 0L,
        BigDecimal(i).setScale(2) / 7, 0L, "U"))
      .toDF("id", "grp", "part", "amt", "ver", "op")
      .withColumn("amt", col("amt").cast("decimal(14,4)"))
    LogTable.create(spark, base, df, Seq("part")): Unit
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MvCount("n"), MvSum("s", "amt"))): Unit
    MaterializedView.refresh(spark, mv): Unit
    val upd2 = (1 to 50).filter(_ % 4 == 0).map(i => (i.toLong, s"g${i % 3}", 0L,
        BigDecimal(i * 3).setScale(2) / 11, 1L, "U"))
      .toDF("id", "grp", "part", "amt", "ver", "op")
      .withColumn("amt", col("amt").cast("decimal(14,4)"))
    LogTable.upsert(spark, base, upd2, Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    val got = MaterializedView.read(spark, mv)
    val want = LogTable.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("s"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"got:\n${got.orderBy("grp").collect().mkString("\n")}\nwant:\n" +
        want.orderBy("grp").collect().mkString("\n"))
  }

  test("definition round-trips through the sidecar file") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 10)
    define(mv, base, nBuckets = 9)
    val d = MaterializedView.definition(spark, mv)
    assert(d.basePath === base)
    assert(d.groupCols === Seq("grp"))
    assert(d.nBuckets === 9)
    assert(d.aggs === Seq(MvCount("n"), MvCountCol("n_x", "x"),
      MvSum("sum_x", "x"), MvAvg("avg_x", "x")))
  }

  test("auto-refresh hook folds each base commit; dataChange=false skips") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 60)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    MaterializedView.enableAutoRefresh(spark, mv): Unit
    try {
      // NO manual refresh below — the post-commit hook must keep pace
      LogTable.upsert(spark, base, upd(Seq(
        (1L, "g1", 1L, Some(999L), 1L, "U"),
        (7L, "g2", 1L, Some(70L), 1L, "D"))),
        Seq("id"), Seq("ver"), "op"): Unit
      assert(MaterializedView.refreshedVersion(spark, mv) ===
        LogTable.latestVersion(spark, base),
        "hook must fold the window before upsert returns")
      assertSame(mv, base)
      // a row-invisible commit (compaction) must NOT fire the hook
      val w = MaterializedView.refreshedVersion(spark, mv)
      LogTable.compactPartitions(spark, base, maxFilesPerPartition = 1): Unit
      assert(MaterializedView.refreshedVersion(spark, mv) === w,
        "dataChange=false commits skip the auto-refresh")
      assertSame(mv, base)
      // after disable, commits stop refreshing
      MaterializedView.disableAutoRefresh(spark, mv)
      LogTable.upsert(spark, base, upd(Seq(
        (2L, "g2", 2L, Some(20L), 2L, "U"))),
        Seq("id"), Seq("ver"), "op"): Unit
      assert(MaterializedView.refreshedVersion(spark, mv) <
        LogTable.latestVersion(spark, base))
      MaterializedView.refresh(spark, mv): Unit
      assertSame(mv, base)
    } finally MaterializedView.disableAutoRefresh(spark, mv)
  }

  test("auto-refresh registration is LOG-persisted: a fresh session's first commit fires it") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 40)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    MaterializedView.enableAutoRefresh(spark, mv): Unit
    try {
      // the registry lives in the base table's committed properties, not
      // in any JVM map — the structural restart-survival claim
      assert(LogTable.snapshot(spark, base).properties
        .get("mv.autorefresh").exists(_.contains("/mv")),
        "registration must ride the log, not process memory")
      // a DIFFERENT session (driver restart: no shared session state)
      // commits to the base — its commit must still fold the view
      val fresh = spark.newSession()
      fresh.conf.set("spark.sql.shuffle.partitions", "2")
      LogTable.upsert(fresh, base, upd(Seq(
        (3L, "g1", 5L, Some(123L), 9L, "U"))),
        Seq("id"), Seq("ver"), "op"): Unit
      assert(MaterializedView.refreshedVersion(spark, mv) ===
        LogTable.latestVersion(spark, base),
        "a fresh session's commit must fire the persisted registration")
      assertSame(mv, base)
    } finally MaterializedView.disableAutoRefresh(spark, mv)
  }

  test("async refresh mode: the commit returns BEFORE the refresh; the view converges") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 40)
    define(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    MaterializedView.enableAutoRefresh(spark, mv): Unit
    LogTable.setProperties(spark, base, Map("mv.refreshmode" -> "async")): Unit
    val latch = new java.util.concurrent.CountDownLatch(1)
    try {
      // wedge the single-thread executor: nothing refreshes until the
      // latch opens, so "the commit returned first" is structural, not
      // a timing accident
      LogTable.mvRefreshExecutor.submit(new Runnable {
        override def run(): Unit = latch.await()
      }): Unit
      val staleV = MaterializedView.refreshedVersion(spark, mv)
      LogTable.upsert(spark, base, upd(Seq(
        (3L, "g1", 5L, Some(321L), 9L, "U"))),
        Seq("id"), Seq("ver"), "op"): Unit
      // the writer is back while the refresh is still queued
      assert(MaterializedView.refreshedVersion(spark, mv) === staleV,
        "async mode must not refresh on the committing thread")
      val done = LogTable.asyncRefreshes.get()
      latch.countDown()
      val deadline = System.currentTimeMillis() + 60000
      while (LogTable.asyncRefreshes.get() == done &&
        System.currentTimeMillis() < deadline) Thread.sleep(50L)
      assert(LogTable.asyncRefreshes.get() > done, "async refresh must run")
      assert(MaterializedView.refreshedVersion(spark, mv) ===
        LogTable.latestVersion(spark, base))
      assertSame(mv, base)
      // coalescing: two commits while wedged fold in ONE queued pass
      LogTable.mvRefreshExecutor.submit(new Runnable {
        override def run(): Unit = latch.await() // already open — no wedge
      }): Unit
      val c0 = LogTable.asyncRefreshes.get()
      LogTable.upsert(spark, base, upd(Seq(
        (4L, "g2", 5L, Some(1L), 9L, "U"))), Seq("id"), Seq("ver"), "op"): Unit
      LogTable.upsert(spark, base, upd(Seq(
        (5L, "g3", 5L, Some(2L), 9L, "U"))), Seq("id"), Seq("ver"), "op"): Unit
      val dl2 = System.currentTimeMillis() + 60000
      while (MaterializedView.refreshedVersion(spark, mv) !=
        LogTable.latestVersion(spark, base) &&
        System.currentTimeMillis() < dl2) Thread.sleep(50L)
      assertSame(mv, base)
      assert(LogTable.asyncRefreshes.get() - c0 <= 2L)
    } finally {
      latch.countDown()
      LogTable.setProperties(spark, base, Map.empty,
        unset = Seq("mv.refreshmode")): Unit
      MaterializedView.disableAutoRefresh(spark, mv)
    }
  }

  private def defineMinMax(mv: String, base: String): Unit =
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MvCount("n"), MvMin("min_x", "x"), MvMax("max_x", "x")), 4): Unit

  private def assertMinMax(mv: String, base: String): Unit = {
    val got = MaterializedView.read(spark, mv)
    val want = LogTable.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"minmax view drifted:\ngot  ${got.orderBy("grp").collect().mkString("|")}" +
        s"\nwant ${want.orderBy("grp").collect().mkString("|")}")
    assert(got.count() === want.count())
  }

  test("min/max: deleting the current extremum rescans and repairs the group") {
    import spark.implicits._
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 100)
    defineMinMax(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    // g1's current minimum is id=1 (x=10): delete it — the fold cannot
    // know the runner-up, the rescan must find 60 (id=6)
    LogTable.upsert(spark, base, upd(Seq((1L, "g1", 1L, Some(10L), 1L, "D"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "g1")
      .select("min_x").as[Long].head() === 60L)
    // g2's current maximum is id=97 (x=970): delete it → rescan → 920
    LogTable.upsert(spark, base, upd(Seq((97L, "g2", 1L, Some(970L), 1L, "D"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "g2")
      .select("max_x").as[Long].head() === 920L)
  }

  test("min/max: pure inserts fold in place; NULL inputs never move extremes") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 50)
    defineMinMax(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    // new global min for g1 + a NULL-x row + a brand-new group
    LogTable.upsert(spark, base, upd(Seq(
      (201L, "g1", 0L, Some(1L), 1L, "U"),
      (202L, "g2", 1L, None, 1L, "U"),
      (203L, "gz", 2L, Some(42L), 1L, "U"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    import spark.implicits._
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "g1")
      .select("min_x").as[Long].head() === 1L)
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "gz")
      .select("min_x", "max_x").as[(Long, Long)].head() === ((42L, 42L)))
  }

  test("min/max: update churn, all-NULL groups and compaction riders stay exact") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base, 60)
    defineMinMax(mv, base)
    MaterializedView.refresh(spark, mv): Unit
    // an UPDATE that moves the minimum down (delete 60 / insert 5 in one
    // window for g1 after removing id=1) and a group whose only non-NULL
    // value disappears (g-only via deleting every x of gz-like rows)
    LogTable.upsert(spark, base, upd(Seq(
      (1L, "g1", 1L, Some(10L), 1L, "D"),
      (6L, "g1", 0L, Some(5L), 1L, "U"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    import spark.implicits._
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "g1")
      .select("min_x").as[Long].head() === 5L)
    // a group reduced to only-NULL inputs reads NULL extremes
    val gz = upd(Seq((301L, "gz", 0L, Some(7L), 1L, "U"),
      (302L, "gz", 1L, None, 1L, "U")))
    LogTable.upsert(spark, base, gz, Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    LogTable.upsert(spark, base, upd(Seq((301L, "gz", 0L, Some(7L), 2L, "D"))),
      Seq("id"), Seq("ver"), "op"): Unit
    MaterializedView.refresh(spark, mv): Unit
    assertMinMax(mv, base)
    assert(MaterializedView.read(spark, mv).filter(col("grp") === "gz")
      .select(col("min_x").isNull, col("max_x").isNull)
      .as[(Boolean, Boolean)].head() === ((true, true)))
    // compaction riders (delete+insert of identical content) must not
    // drift the extremes — the rescan recomputes them identically
    LogTable.compactPartitions(spark, base, maxFilesPerPartition = 1): Unit
    if (MaterializedView.refreshedVersion(spark, mv) <
        LogTable.latestVersion(spark, base)) {
      MaterializedView.refresh(spark, mv): Unit
    }
    assertMinMax(mv, base)
  }
}
