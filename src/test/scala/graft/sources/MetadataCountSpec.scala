package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metadata-only count(*): the global unfiltered count over a log-table
  * relation folds to the log's exact row counts (a one-row
  * LocalRelation, zero scan), and every shape that could change the
  * answer — filters, grouping, DISTINCT, deletion vectors — stays on
  * the scanning path.
  */
class MetadataCountSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-mcount").toString + "/t"

  private def mk(dir: String): Unit =
    LogTable.create(spark, dir,
      (0L until 30L).map(i => (i, s"p${i % 3}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))

  private def isFolded(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => ()
    }.isDefined

  test("count(*) folds to the log's row count — no scan in the plan") {
    val t = tmp()
    mk(t)
    val df = spark.sql(s"SELECT count(*) AS n FROM graft.`$t`")
    assert(isFolded(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head().getLong(0) == 30L)
    // stays exact across writes and a rewriting delete
    LogTable.append(spark, t, Seq((100L, "p0", 1L)).toDF("k", "p", "v")): Unit
    LogTable.deleteWhere(spark, t, col("k") % 2 === 0): Unit
    val df2 = spark.sql(s"SELECT count(*) AS n FROM graft.`$t`")
    assert(isFolded(df2))
    assert(df2.head().getLong(0) == LogTable.read(spark, t).count())
    // time travel folds against the pinned snapshot (the SQL surface
    // and LogTable.table share the FileIndex plan; LogTable.read's
    // direct-parquet path is out of scope by design)
    val df3 = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` VERSION AS OF 1")
    assert(isFolded(df3) && df3.head().getLong(0) == 30L)
  }

  test("global min/max over stats-tracked columns fold too — mixed " +
    "with count in one aggregate") {
    val t = tmp()
    mk(t)
    val df = spark.sql(s"SELECT min(k) AS lo, max(k) AS hi, " +
      s"count(*) AS n, min(p) AS plo FROM graft.`$t`")
    assert(isFolded(df), df.queryExecution.optimizedPlan.toString)
    val r = df.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 29L &&
      r.getLong(2) == 30L && r.getString(3) == "p0")
    // a column without universal stats declines (v is untracked)
    val dfv = spark.sql(s"SELECT max(v) AS hv FROM graft.`$t`")
    assert(!isFolded(dfv))
    assert(dfv.head().getLong(0) == 29L)
    // the fold tracks deletes exactly (victims re-stat on rewrite)
    LogTable.deleteWhere(spark, t, col("k") >= 25L): Unit
    val df2 = spark.sql(s"SELECT max(k) AS hi FROM graft.`$t`")
    assert(isFolded(df2) && df2.head().getLong(0) == 24L)
  }

  test("a FULLY stats-decided filtered count folds; one undecided " +
    "boundary file sends the whole aggregate back to the scan") {
    val t = tmp()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "12")
    try mk(t) finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // partition-aligned predicate: every file provably in or out
    val aligned = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` WHERE p = 'p1'")
    assert(isFolded(aligned),
      aligned.queryExecution.optimizedPlan.toString)
    assert(aligned.head().getLong(0) == 10L)
    // a mid-range bound on k leaves boundary files undecided — scans
    val boundary = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` WHERE k < 13")
    assert(!isFolded(boundary))
    assert(boundary.head().getLong(0) == 13L)
    // a provably-empty predicate folds to zero
    val empty = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` WHERE k < 0")
    assert(isFolded(empty) && empty.head().getLong(0) == 0L)
  }

  test("ineligible shapes keep scanning: filter, group-by, distinct, " +
    "deletion vectors — and still answer exactly") {
    val t = tmp()
    mk(t)
    val filtered = spark.sql(
      s"SELECT count(*) AS n FROM graft.`$t` WHERE k < 10")
    assert(!isFolded(filtered))
    assert(filtered.head().getLong(0) == 10L)
    val grouped = spark.sql(
      s"SELECT p, count(*) AS n FROM graft.`$t` GROUP BY p")
    assert(!isFolded(grouped))
    assert(grouped.collect().map(_.getLong(1)).sum == 30L)
    val distinct = spark.sql(
      s"SELECT count(DISTINCT p) AS n FROM graft.`$t`")
    assert(!isFolded(distinct))
    assert(distinct.head().getLong(0) == 3L)
    // a DV'd snapshot plans the anti-join above the relation — the
    // fold cannot (and must not) match, and the count stays live-exact
    LogTable.deleteWhere(spark, t, col("k") === 1L,
      deletionVectors = true): Unit
    val dv = LogTable.table(spark, t).agg(count(lit(1)).as("n"))
    assert(!isFolded(dv))
    assert(dv.head().getLong(0) == 29L)
  }
}
