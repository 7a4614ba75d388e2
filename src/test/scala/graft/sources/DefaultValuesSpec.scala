package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-side column DEFAULTs (the Delta semantics: a batch that OMITS
  * the column fills the declared literal; pre-existing rows read NULL)
  * and predicate-scoped `OPTIMIZE ... WHERE`.
  */
class DefaultValuesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-dflt").toString

  private def mk(dir: String): Unit =
    LogTable.create(spark, dir,
      (0L until 12L).map(i => (i, s"p${i % 2}", i * 10L)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))

  test("ADD COLUMNS ... DEFAULT: omitted-column batches fill the " +
    "default, supplied values win, old rows stay NULL") {
    val t = tmp()
    mk(t)
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
      "(src STRING DEFAULT 'etl', score INT)"): Unit
    val snap = LogTable.snapshot(spark, t)
    assert(snap.properties.get("coldefault.src").contains("'etl'"))
    assert(!snap.properties.keys.exists(_ == "coldefault.score"))
    // pre-existing rows: NULL (metadata-only ADD never rewrites)
    assert(LogTable.read(spark, t).filter(col("src").isNotNull).count() == 0L)
    // a batch omitting BOTH new columns: src defaults, score refuses
    intercept[IllegalArgumentException] {
      LogTable.append(spark, t,
        Seq((100L, "p0", 1L)).toDF("k", "p", "v")): Unit
    }
    // a batch omitting only the DEFAULT'd column fills it
    LogTable.append(spark, t,
      Seq((100L, "p0", 1L, 7)).toDF("k", "p", "v", "score")): Unit
    val row = LogTable.read(spark, t).filter(col("k") === 100L).head()
    assert(row.getAs[String]("src") == "etl")
    assert(row.getAs[Int]("score") == 7)
    // a batch SUPPLYING the column keeps its values
    LogTable.append(spark, t,
      Seq((101L, "p1", 2L, "manual", 9))
        .toDF("k", "p", "v", "src", "score")): Unit
    assert(LogTable.read(spark, t).filter(col("k") === 101L)
      .head().getAs[String]("src") == "manual")
  }

  test("defaults survive RENAME COLUMN (physical key) and die with " +
    "DROP COLUMN; non-literal defaults refuse") {
    val t = tmp()
    mk(t)
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
      "(tag STRING DEFAULT 'x')"): Unit
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN tag TO label"): Unit
    LogTable.append(spark, t,
      Seq((200L, "p0", 1L)).toDF("k", "p", "v")): Unit
    assert(LogTable.read(spark, t).filter(col("k") === 200L)
      .head().getAs[String]("label") == "x")
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN label"): Unit
    assert(!LogTable.snapshot(spark, t).properties.keys
      .exists(_.startsWith("coldefault.")))
    // a default referencing a column is not a literal — refuse loud
    intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
        "(bad BIGINT DEFAULT v + 1)"): Unit
    }
    // an expression default that FOLDS to a constant is fine
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
      "(basis DATE DEFAULT DATE'2024-01-01')"): Unit
    LogTable.append(spark, t,
      Seq((201L, "p1", 3L)).toDF("k", "p", "v")): Unit
    assert(LogTable.read(spark, t).filter(col("k") === 201L)
      .head().getAs[java.sql.Date]("basis").toString == "2024-01-01")
  }

  test("OPTIMIZE ... WHERE compacts only the matching partition's " +
    "files; the rest stay byte-identical") {
    val t = tmp()
    // fragment both partitions: many small appends
    LogTable.create(spark, t,
      Seq((0L, "p0", 0L)).toDF("k", "p", "v"), Seq("p"),
      statsCols = Seq("k"))
    (1 to 4).foreach { i =>
      LogTable.append(spark, t,
        Seq((i.toLong, "p0", i * 10L), (100L + i, "p1", i * 7L))
          .toDF("k", "p", "v")): Unit
    }
    val before = LogTable.snapshot(spark, t)
    val p1Before = before.files.filter(f =>
      f.pmin == "p1" || f.pmax == "p1").map(_.name).toSet
    assert(before.files.count(f => f.pmin == "p0") > 2)
    val v = spark.sql(
      s"OPTIMIZE graft.`$t` WHERE p = 'p0' MAX 2 FILES PER PARTITION")
      .head().getLong(0)
    assert(v > 0)
    val after = LogTable.snapshot(spark, t)
    // p1's files untouched; p0's fragments gone; rows intact
    assert(after.files.filter(f => f.pmin == "p1" || f.pmax == "p1")
      .map(_.name).toSet == p1Before,
      "OPTIMIZE WHERE must not rewrite non-matching partitions")
    assert(after.files.count(f => f.pmin == "p0" && f.pmax == "p0") <= 2)
    assert(LogTable.read(spark, t).count() == 9L)
    // scoped no-op converges
    assert(LogTable.compactPartitions(spark, t, maxFilesPerPartition = 2,
      where = Some(col("p") === "p0")) == -1L)
  }

  test("OPTIMIZE WHERE composes with ZORDER BY: only the matching " +
    "partition re-clusters") {
    val t = tmp()
    LogTable.create(spark, t,
      (0L until 24L).map(i => (i, (i * 7) % 24, s"p${i % 2}", i))
        .toDF("k", "x", "p", "v"),
      Seq("p"), statsCols = Seq("k", "x"))
    (1 to 3).foreach { i =>
      LogTable.append(spark, t,
        (0L until 4L).map(j => (100L * i + j, (j * 5) % 24, s"p${j % 2}", j))
          .toDF("k", "x", "p", "v")): Unit
    }
    val p1Before = LogTable.snapshot(spark, t).files
      .filter(f => f.pmin == "p1" || f.pmax == "p1").map(_.name).toSet
    val v = spark.sql(s"OPTIMIZE graft.`$t` WHERE p = 'p0' " +
      "MAX 2 FILES PER PARTITION ZORDER BY (k, x)").head().getLong(0)
    assert(v > 0)
    val after = LogTable.snapshot(spark, t)
    assert(after.files.filter(f => f.pmin == "p1" || f.pmax == "p1")
      .map(_.name).toSet == p1Before)
    assert(LogTable.read(spark, t).count() == 36L)
  }
}
