package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RENAME TABLE — one atomic directory move (the log is self-contained:
  * relative file names), plus the absolute-URI bookkeeping: clone
  * markers re-point, MV registrations re-point, and the cases where a
  * dangling reference would be silent are refused loud instead.
  */
class RenameTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-rename").toString

  private def mk(dir: String, n: Int = 30): Unit =
    LogTable.create(spark, dir,
      (0L until n.toLong).map(i => (i, i * 10, s"p${i % 3}"))
        .toDF("k", "v", "p"), Seq("p"), statsCols = Seq("k"))

  test("rename moves the table whole: data, history, time travel, stats pruning") {
    val root = tmp()
    val a = root + "/a"; val b = root + "/sub/b"
    mk(a)
    LogTable.updateWhere(spark, a, col("k") === 3L,
      Map("v" -> lit(999L))): Unit
    LogTable.renameTable(spark, a, b)
    assert(!new java.io.File(a).exists())
    assert(LogTable.read(spark, b).count() == 30L)
    assert(LogTable.read(spark, b).filter(col("k") === 3L)
      .select("v").as[Long].head() == 999L)
    // history + time travel survive (versions are table-rooted)
    assert(LogTable.latestVersion(spark, b) == 2L)
    assert(LogTable.read(spark, b, asOf = Some(1L))
      .filter(col("k") === 3L).select("v").as[Long].head() == 30L)
    // stats skipping unaffected
    assert(LogTable.countWhere(spark, b, col("k") < 0L).scannedFiles == 0)
    // and DML keeps working at the new home
    LogTable.deleteWhere(spark, b, col("k") === 5L): Unit
    assert(LogTable.read(spark, b).count() == 29L)
  }

  test("catalog: ALTER TABLE ... RENAME TO through SQL names") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.rlake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlake.root", root)
    (0L until 10L).map(i => (i, s"p${i % 2}")).toDF("k", "p")
      .createOrReplaceTempView("rn_base")
    spark.sql(s"CREATE TABLE graft.`$root/t1` PARTITIONED BY (p) " +
      "AS SELECT * FROM rn_base"): Unit
    spark.sql("ALTER TABLE rlake.t1 RENAME TO t2"): Unit
    assert(spark.sql("SELECT count(*) AS n FROM rlake.t2")
      .head().getLong(0) == 10L)
    assert(!new java.io.File(root, "t1").exists())
    intercept[Exception](spark.sql("SELECT * FROM rlake.t1").collect())
  }

  test("refusals: live clones and registered MVs hold the table in place") {
    val root = tmp()
    val src = root + "/src"; val cl = root + "/cl"
    mk(src)
    LogTable.clone(spark, src, cl): Unit
    val e = intercept[IllegalArgumentException](
      LogTable.renameTable(spark, src, root + "/moved"))
    assert(e.getMessage.contains("clone"))
    // MV registration refuses too
    val base = root + "/base"; val mv = root + "/mv"
    LogTable.create(spark, base,
      (1 to 20).map(i => (i.toLong, s"g${i % 3}", i.toLong, 0L, "U"))
        .toDF("id", "grp", "x", "ver", "op"), Seq("grp"), Seq("id"))
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MaterializedView.MvCount("n")), 2): Unit
    MaterializedView.refresh(spark, mv): Unit
    MaterializedView.enableAutoRefresh(spark, mv): Unit
    try {
      val e2 = intercept[IllegalArgumentException](
        LogTable.renameTable(spark, base, root + "/base2"))
      assert(e2.getMessage.contains("materialized view"))
    } finally MaterializedView.disableAutoRefresh(spark, mv)
  }

  test("renaming a CLONE re-points its source marker (vacuum protection never lapses)") {
    val root = tmp()
    val src = root + "/src"; val cl = root + "/cl"; val cl2 = root + "/cl2"
    mk(src)
    LogTable.clone(spark, src, cl): Unit
    LogTable.renameTable(spark, cl, cl2)
    // the source still refuses to vacuum the clone's files away
    LogTable.updateWhere(spark, src, col("p") === "p1",
      Map("v" -> (col("v") + 1))): Unit
    Thread.sleep(5L)
    LogTable.vacuum(spark, src, 0L, force = true): Unit
    assert(LogTable.read(spark, cl2).count() == 30L,
      "renamed clone must keep reading through the re-pointed marker")
    // exactly one marker, recording the NEW location
    val markers = new java.io.File(src, "_graft_clones").listFiles()
      .filterNot(_.getName.startsWith(".")) // local-FS .crc sidecars
    assert(markers.length == 1)
    val content = new String(java.nio.file.Files.readAllBytes(
      markers.head.toPath))
    assert(content.endsWith("/cl2"))
  }

  test("renaming an MV re-points its base's auto-refresh registration") {
    val root = tmp()
    val base = root + "/base"; val mv = root + "/mv"; val mv2 = root + "/mv2"
    LogTable.create(spark, base,
      (1 to 20).map(i => (i.toLong, s"g${i % 3}", i.toLong, 0L, "U"))
        .toDF("id", "grp", "x", "ver", "op"), Seq("grp"), Seq("id"))
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MaterializedView.MvCount("n"),
        MaterializedView.MvSum("sum_x", "x")), 2): Unit
    MaterializedView.refresh(spark, mv): Unit
    MaterializedView.enableAutoRefresh(spark, mv): Unit
    try {
      LogTable.renameTable(spark, mv, mv2)
      val reg = LogTable.snapshot(spark, base).properties("mv.autorefresh")
      assert(reg.endsWith("/mv2") && !reg.contains("/mv;") &&
        !reg.stripSuffix("/mv2").endsWith("/mv"))
      // a base commit fires the refresh at the NEW location
      LogTable.upsert(spark, base,
        Seq((99L, "g1", 7L, 1L, "U")).toDF("id", "grp", "x", "ver", "op"),
        Seq("id"), Seq("ver"), "op"): Unit
      assert(MaterializedView.refreshedVersion(spark, mv2) ==
        LogTable.latestVersion(spark, base))
      val got = MaterializedView.read(spark, mv2)
        .filter(col("grp") === "g1").select("sum_x").as[Long].head()
      val want = LogTable.read(spark, base).filter(col("grp") === "g1")
        .agg(sum("x")).as[Long].head()
      assert(got == want)
    } finally MaterializedView.disableAutoRefresh(spark, mv2)
  }
}
