package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incrementally-maintained NDV: declared columns get a per-file HLL
  * sketch in the same one-pass stats scan every write already runs;
  * the snapshot unions them into table-level distinct counts that feed
  * CBO column statistics — no ANALYZE rescan, and because the sketches
  * live per FILE, deletes/compaction update the estimate for free.
  */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ndv").toString

  private def mk(dir: String): Unit =
    LogTable.create(spark, dir,
      (0L until 40L).map(i => (i, s"p${i % 2}", s"u${i % 7}", i * 3L))
        .toDF("k", "p", "u", "v"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map("ndv.cols" -> "k,u"))

  test("declared columns carry per-file sketches; the snapshot union " +
    "matches the exact distinct count at small cardinality") {
    val t = tmp()
    mk(t)
    val snap = LogTable.snapshot(spark, t)
    assert(snap.files.forall(_.stats.collectFirst {
      case (c, s) if c.equalsIgnoreCase("k") => s.ndv.isDefined
    }.getOrElse(false)), "every file must carry the declared sketch")
    // HLL is EXACT in list mode at these cardinalities
    assert(snap.ndv("k") == 40L, s"ndv(k) = ${snap.ndv("k")}")
    assert(snap.ndv("u") == 7L, s"ndv(u) = ${snap.ndv("u")}")
    assert(!snap.ndv.contains("v"), "undeclared columns carry nothing")
  }

  test("writes grow the estimate, deletes shrink it (removed files' " +
    "sketches drop out), checkpoint round-trips it") {
    val t = tmp()
    mk(t)
    LogTable.append(spark, t,
      (100L until 120L).map(i => (i, s"p${i % 2}", s"u${i % 11}", i))
        .toDF("k", "p", "u", "v")): Unit
    assert(LogTable.snapshot(spark, t).ndv("k") == 60L)
    // a rewriting delete drops whole value ranges — the estimate follows
    LogTable.deleteWhere(spark, t, col("k") >= 100L): Unit
    assert(LogTable.snapshot(spark, t).ndv("k") == 40L,
      "rewritten victims must re-sketch without the deleted rows")
    LogTable.checkpoint(spark, t): Unit
    LogTable.expireLog(spark, t): Unit
    assert(LogTable.snapshot(spark, t).ndv("k") == 40L,
      "sketches must survive the checkpoint round trip")
  }

  test("CBO column statistics surface the log-carried NDV and exact " +
    "null counts — no ANALYZE ever ran") {
    val t = tmp()
    mk(t)
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = LogTable.table(spark, t)
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.get("k").flatMap(_.distinctCount).contains(BigInt(40)),
        s"CBO must see ndv(k)=40, got ${byName.get("k")}")
      assert(byName.get("u").flatMap(_.distinctCount).contains(BigInt(7)))
      assert(byName.get("k").flatMap(_.nullCount).contains(BigInt(0)))
      // numeric min/max merged from per-file stats ride along — range
      // selectivity without ANALYZE
      assert(byName.get("k").flatMap(_.min).contains(0L))
      assert(byName.get("k").flatMap(_.max).contains(39L))
      assert(stats.rowCount.contains(BigInt(40)))
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("CTAS declares ndv.cols through TBLPROPERTIES; engine-owned " +
    "namespaces refuse") {
    val t = tmp() + "/t"
    (0L until 25L).map(i => (i, s"p${i % 2}")).toDF("k", "p")
      .createOrReplaceTempView("ndv_ctas_base")
    spark.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (p) " +
      "STATS BY (k) TBLPROPERTIES ('ndv.cols' = 'k') " +
      "AS SELECT * FROM ndv_ctas_base"): Unit
    assert(LogTable.snapshot(spark, t).ndv("k") == 25L)
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE graft.`${t}2` " +
        "TBLPROPERTIES ('colmap.map.x' = 'y') " +
        "AS SELECT * FROM ndv_ctas_base"): Unit
    }
  }

  test("sketches follow RENAME COLUMN (physical key) and keep " +
    "accumulating on post-rename writes") {
    val t = tmp()
    mk(t)
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN u TO user_bucket"): Unit
    LogTable.append(spark, t,
      (200L until 210L).map(i => (i, s"p${i % 2}", s"u${i % 13}", i))
        .toDF("k", "p", "user_bucket", "v")): Unit
    val snap = LogTable.snapshot(spark, t)
    // at-rest key stays the physical `u`; 0..6 plus 0..12 tags = 13
    assert(snap.ndv("u") == 13L, s"ndv(u) = ${snap.ndv}")
  }
}
