package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Feasibility pin for ADD-width schema evolution: the vectorized
  * parquet reader must serve physically-narrow columns under a widened
  * read schema WITHOUT rewriting old files, or type widening cannot be
  * a metadata-only operation.
  */
class WideningProbeSpec extends SparkSpec {
  import spark.implicits._

  test("parquet reads int32 under LONG, float under DOUBLE, int under DECIMAL") {
    val dir = Files.createTempDirectory("graft-widen").toString + "/t"
    Seq((1, 1.5f, 10), (2, 2.5f, 20)).toDF("i", "f", "d")
      .write.parquet(dir)
    val widened = spark.read
      .schema("i LONG, f DOUBLE, d DECIMAL(12,0)").parquet(dir)
    val got = widened.as[(Long, Double, java.math.BigDecimal)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.map(_._2) == Seq(1.5d, 2.5d))
    assert(got.map(_._3.longValueExact()) == Seq(10L, 20L))
  }

  test("type widening evolves int→long metadata-only; untouched files survive") {
    val dir = Files.createTempDirectory("graft-widen").toString + "/t"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      LogTable.create(spark, dir, Seq(
        (1L, 100, 0, "p1", "U"), (2L, 200, 0, "p1", "U"),
        (3L, 300, 0, "p2", "U"), (4L, 400, 0, "p3", "U"))
        .toDF("k", "cents", "ver", "p", "op"),
        Seq("p"), statsCols = Seq("cents")): Unit
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val before = LogTable.snapshot(spark, dir)
    assert(before.schema("cents").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // a LONG batch (value past Int.MaxValue) on ONE partition: rejected
    // without mergeSchema, widens the committed type with it
    val big = Seq((1L, 10_000_000_000L, 1, "p1", "U"))
      .toDF("k", "cents", "ver", "p", "op")
    intercept[IllegalArgumentException] {
      LogTable.upsert(spark, dir, big, Seq("k"), Seq("ver"), "op")
    }
    LogTable.upsert(spark, dir, big, Seq("k"), Seq("ver"), "op",
      mergeSchema = true): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.schema("cents").dataType ==
      org.apache.spark.sql.types.LongType)
    // untouched partitions' files survived BY NAME — no rewrite
    val untouched = before.files.filter(f => f.pmin >= "p2").map(_.name).toSet
    assert(untouched.nonEmpty &&
      untouched.subsetOf(after.files.map(_.name).toSet))
    // narrow-era files read under the wide schema, values exact
    assert(LogTable.read(spark, dir).select("k", "cents")
      .as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10_000_000_000L), (2L, 200L), (3L, 300L), (4L, 400L)))
    // stats written in the int era still SKIP under the long schema —
    // the count is right AND files were excluded by metadata alone
    val cr = LogTable.countWhere(spark, dir,
      org.apache.spark.sql.functions.col("cents") === 300L)
    assert(cr.count == 1L && cr.excludedFiles > 0, cr.toString)
    // a narrow INT batch now upcasts into the widened table — alignment,
    // not evolution, no mergeSchema needed (appends too)
    LogTable.upsert(spark, dir, Seq((5L, 500, 0, "p2", "U"))
      .toDF("k", "cents", "ver", "p", "op"),
      Seq("k"), Seq("ver"), "op"): Unit
    LogTable.append(spark, dir, Seq((6L, 600, 0, "p3", "U"))
      .toDF("k", "cents", "ver", "p", "op")): Unit
    assert(LogTable.read(spark, dir).count() == 6L)
    assert(LogTable.snapshot(spark, dir).schema("cents").dataType ==
      org.apache.spark.sql.types.LongType)
    // a genuinely incompatible type stays loud
    intercept[IllegalArgumentException] {
      LogTable.upsert(spark, dir, Seq((7L, "oops", 0, "p1", "U"))
        .toDF("k", "cents", "ver", "p", "op"),
        Seq("k"), Seq("ver"), "op", mergeSchema = true)
    }
  }
}
