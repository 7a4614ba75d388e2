package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-backed `approx_count_distinct` as an incrementally-maintained
  * MV aggregate: inserts UNION into the stored per-group HLL sketch
  * (mergeable, no rescan); a delete of a non-NULL input rescans exactly
  * that group (a sketch cannot retract). At these cardinalities lgK 12
  * is exact, so the estimates are compared EXACTLY to count(distinct).
  */
class ApproxDistinctMvSpec extends SparkSpec {
  import MaterializedView._
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-adcmv").toString

  private def mkBase(path: String): Unit = {
    // duplicated user ids inside each group: 40 rows, ids i % 11
    val df = (1 to 40).map { i =>
      (i.toLong, s"g${i % 3}", (i % 2).toLong, (i % 11).toLong, 0L, "U")
    }.toDF("id", "grp", "part", "uid", "ver", "op")
    LogTable.create(spark, path, df, Seq("part"), Seq("id")): Unit
  }

  private def assertSame(mv: String, base: String): Unit = {
    val got = MaterializedView.read(spark, mv)
    val want = LogTable.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("uid")).as("adc_uid"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"view != recompute:\n got ${got.collect().mkString(";")}\n " +
        s"want ${want.collect().mkString(";")}")
  }

  test("initial load, insert-only fold, full-value delete (rescan) and " +
    "duplicate-copy delete all track count(distinct) exactly") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base)
    MaterializedView.define(spark, mv, base, Seq("grp"),
      Seq(MvCount("n"), MvApproxDistinct("adc_uid", "uid")), nBuckets = 4): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assertSame(mv, base)
    // INSERT-only window: new ids extend the sketch in place
    LogTable.upsert(spark, base,
      Seq((100L, "g0", 0L, 100L, 1L, "U"), (101L, "g1", 1L, 101L, 1L, "U"))
        .toDF("id", "grp", "part", "uid", "ver", "op"),
      Seq("id"), Seq("ver"), "op"): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assertSame(mv, base)
    // delete EVERY row carrying uid=3 in g0 — the distinct count drops,
    // which only a rescan can know
    LogTable.deleteWhere(spark, base,
      col("grp") === "g0" && col("uid") === 3L): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assertSame(mv, base)
    // delete ONE copy of a still-duplicated uid — the count must NOT drop
    val victim = LogTable.read(spark, base)
      .filter(col("grp") === "g1" && col("uid") === 4L)
      .select("id").as[Long].collect()
    assert(victim.length >= 2, "fixture needs a duplicated uid")
    LogTable.deleteWhere(spark, base, col("id") === victim.head): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    assertSame(mv, base)
    // NULL-input groups answer 0, like approx_count_distinct would
    LogTable.upsert(spark, base,
      Seq((200L, "gN", 0L, 0L, 1L, "U"))
        .toDF("id", "grp", "part", "uid", "ver", "op")
        .withColumn("uid", lit(null).cast("long")),
      Seq("id"), Seq("ver"), "op"): Unit
    assert(MaterializedView.refresh(spark, mv) > 0L)
    val gN = MaterializedView.read(spark, mv).filter(col("grp") === "gN")
    assert(gN.select("adc_uid").as[Long].head() == 0L)
  }

  test("SQL: CREATE MATERIALIZED VIEW accepts approx_count_distinct; " +
    "exact DISTINCT still refuses") {
    val base = tmp(); val mv = tmp() + "/mv"
    mkBase(base)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` BUCKETS 4 AS " +
      s"SELECT grp, count(*) AS n, approx_count_distinct(uid) AS adc_uid " +
      s"FROM graft.`$base` GROUP BY grp"): Unit
    assertSame(mv, base)
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.`${mv}2` AS " +
        s"SELECT grp, count(DISTINCT uid) AS du " +
        s"FROM graft.`$base` GROUP BY grp").collect(): Unit
    }
  }
}
