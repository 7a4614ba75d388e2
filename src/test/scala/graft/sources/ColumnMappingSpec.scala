package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.catalog.TableChange

import graft.SparkSpec

/** COLUMN MAPPING — metadata-only RENAME/DROP COLUMN: the at-rest
  * physical name (files, per-file stats keys) never moves; the logical
  * name lives in the versioned DDL plus a `colmap.map.*` property.
  * Zero files rewritten, old versions time-travel under their own
  * names, stats pruning and every DML path translate at the boundary.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-colmap").toString

  private def mk(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      LogTable.create(spark, dir,
        (0L until 40L).map(i => (i, i * 10, s"p${i % 4}"))
          .toDF("k", "v", "p"), Seq("p"), statsCols = Seq("k", "v"),
        clusterBy = Seq("k"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def rename(dir: String, from: String, to: String): Long =
    LogTable.evolveSchema(spark, dir,
      Seq(TableChange.renameColumn(Array(from), to)))

  private def drop(dir: String, c: String): Long =
    LogTable.evolveSchema(spark, dir,
      Seq(TableChange.deleteColumn(Array(c), false)))

  test("rename is metadata-only: zero files touched, data preserved, old versions readable") {
    val dir = tmp()
    mk(dir)
    val before = LogTable.snapshot(spark, dir)
    rename(dir, "v", "value"): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.files.map(_.name).sorted == before.files.map(_.name).sorted,
      "a rename must not touch a single data file")
    assert(after.schema.fieldNames.toSeq == Seq("k", "value", "p"))
    assert(after.colMap == Map("value" -> "v"))
    val df = LogTable.read(spark, dir)
    assert(df.columns.toSeq == Seq("k", "value", "p"))
    assert(df.agg(sum("value")).as[Long].head() ==
      (0L until 40L).map(_ * 10).sum)
    // time travel: the pre-rename version still answers under `v`
    val old = LogTable.read(spark, dir, asOf = Some(before.version))
    assert(old.columns.toSeq == Seq("k", "v", "p"))
    assert(old.agg(sum("v")).as[Long].head() ==
      (0L until 40L).map(_ * 10).sum)
  }

  test("stats pruning still prunes on the renamed name (both read and metadata paths)") {
    val dir = tmp()
    mk(dir)
    rename(dir, "k", "id"): Unit
    // k was cluster-sorted, so per-file ranges are tight — a point
    // predicate on the NEW name must still exclude files via the
    // stats keyed under the OLD (physical) name
    val r = LogTable.countWhere(spark, dir, col("id") === 7L)
    assert(r.count == 1L)
    assert(r.excludedFiles > 0,
      s"renamed-column predicate must still prune (excluded=${r.excludedFiles})")
    // the FileIndex path (filters arrive PHYSICAL through the alias
    // projection): same pruning through an ordinary filter
    assert(LogTable.read(spark, dir).filter(col("id") === 7L).count() == 1L)
  }

  test("DML after rename: update, delete (incl. DV), merge all speak the new name") {
    val dir = tmp()
    mk(dir)
    rename(dir, "v", "value"): Unit
    LogTable.updateWhere(spark, dir, col("k") === 3L,
      Map("value" -> lit(777L))): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 3L)
      .select("value").as[Long].head() == 777L)
    // DV delete keyed on the renamed predicate column
    LogTable.deleteWhere(spark, dir, col("value") === 777L,
      deletionVectors = true): Unit
    assert(LogTable.read(spark, dir).count() == 39L)
    assert(LogTable.read(spark, dir).filter(col("k") === 3L).count() == 0L)
    // MERGE INTO through the renamed schema (update + insert clauses)
    LogTable.mergeInto(spark, dir,
      Seq((5L, 5555L, "p1"), (100L, 1000L, "p0"))
        .toDF("k", "value", "p"), Seq("k"))
      .whenMatchedUpdate(Map("value" -> "s.value"))
      .whenNotMatchedInsert()
      .run(): Unit
    assert(LogTable.read(spark, dir).count() == 40L)
    assert(LogTable.read(spark, dir).filter(col("k") === 100L)
      .select("value").as[Long].head() == 1000L)
    assert(LogTable.read(spark, dir).filter(col("k") === 5L)
      .select("value").as[Long].head() == 5555L)
  }

  test("rename-then-widen composes; change feed crosses the rename") {
    val dir = tmp()
    LogTable.create(spark, dir,
      (0 until 20).map(i => (i.toLong, i * 10, s"p${i % 2}"))
        .toDF("k", "v", "p"), Seq("p"), statsCols = Seq("k"))
    val v0 = LogTable.snapshot(spark, dir).version
    rename(dir, "v", "value"): Unit
    LogTable.evolveSchema(spark, dir, Seq(
      TableChange.updateColumnType(Array("value"),
        org.apache.spark.sql.types.LongType))): Unit
    intercept[IllegalArgumentException] {
      // narrowing refused with the lattice's message, under the NEW name
      LogTable.evolveSchema(spark, dir, Seq(
        TableChange.updateColumnType(Array("value"),
          org.apache.spark.sql.types.IntegerType))): Unit
    }
    LogTable.append(spark, dir,
      Seq((200L, 5L, "p1")).toDF("k", "value", "p")): Unit
    val snap = LogTable.snapshot(spark, dir)
    // physical names are stable across renames, so a file-level change
    // feed spanning the rename reads BOTH sides under the new schema
    val cdf = LogTable.readChanges(spark, dir, v0, snap.version)
    assert(cdf.columns.contains("value"))
    assert(cdf.filter(col("_change_type") === "insert")
      .agg(sum("value")).as[Long].head() == 5L)
    assert(LogTable.read(spark, dir).agg(sum("value")).as[Long].head() ==
      (0 until 20).map(_ * 10).sum + 5L)
  }

  test("drop is metadata-only; re-adding the name never resurrects old values") {
    val dir = tmp()
    mk(dir)
    val before = LogTable.snapshot(spark, dir)
    drop(dir, "v"): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.files.map(_.name).sorted == before.files.map(_.name).sorted,
      "a drop must not touch a single data file")
    assert(after.schema.fieldNames.toSeq == Seq("k", "p"))
    assert(after.droppedPhysicals == Set("v"))
    assert(!after.statsCols.exists(_.equalsIgnoreCase("v")),
      "a dropped stats column leaves the tracked list")
    assert(LogTable.read(spark, dir).columns.toSeq == Seq("k", "p"))
    // old version still carries it
    assert(LogTable.read(spark, dir, asOf = Some(before.version))
      .columns.contains("v"))
    // re-ADD the same logical name: a FRESH physical name is mapped, so
    // pre-drop files NULL-fill instead of resurrecting the old values
    LogTable.evolveSchema(spark, dir, Seq(TableChange.addColumn(
      Array("v"), org.apache.spark.sql.types.LongType, true))): Unit
    val snap2 = LogTable.snapshot(spark, dir)
    assert(snap2.colMap.keySet == Set("v"))
    assert(snap2.physicalOf("v") != "v")
    val vals = LogTable.read(spark, dir).select("v").as[Option[Long]].collect()
    assert(vals.forall(_.isEmpty),
      "re-added column must NULL-fill, never resurrect dropped data")
    // merge-schema evolution refuses the same resurrection by name
    val e = intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, dir, Seq(TableChange.deleteColumn(
        Array("v"), false))): Unit
      LogTable.upsert(spark, dir,
        Seq((1L, "p0", 9L, "U")).toDF("k", "p", "v", "op"),
        keyCols = Seq("k"), orderCols = Seq("k"), opCol = "op",
        mergeSchema = true): Unit
    }
    assert(e.getMessage.contains("ADD COLUMNS"))
  }

  test("append(mergeSchema): new + wider batch columns evolve in the append's own commit") {
    val dir = tmp()
    LogTable.create(spark, dir,
      (0 until 10).map(i => (i.toLong, i * 10, s"p${i % 2}"))
        .toDF("k", "v", "p"), Seq("p"), statsCols = Seq("k"))
    // strict append still refuses drift loud
    intercept[IllegalArgumentException] {
      LogTable.append(spark, dir,
        Seq((100L, 1L, "p0", "x")).toDF("k", "v", "p", "note"))
    }
    val v = LogTable.append(spark, dir,
      Seq((100L, 999999999999L, "p0", "x")).toDF("k", "v", "p", "note"),
      mergeSchema = true)
    val snap = LogTable.snapshot(spark, dir)
    assert(v == snap.version, "one commit: evolution + append atomic")
    assert(snap.schema("v").dataType ==
      org.apache.spark.sql.types.LongType, "int widened to the batch's long")
    assert(snap.schema.fieldNames.contains("note"))
    assert(LogTable.read(spark, dir).filter(col("note").isNotNull)
      .count() == 1L)
    // resurrection guard: a dropped physical name cannot come back via
    // a merge-schema append either
    drop(dir, "note"): Unit
    val e = intercept[IllegalArgumentException] {
      LogTable.append(spark, dir,
        Seq((101L, 5L, "p1", "y")).toDF("k", "v", "p", "note"),
        mergeSchema = true)
    }
    assert(e.getMessage.contains("ADD COLUMNS"))
  }

  test("RESTORE crosses a rename atomically: DDL and mapping revert together") {
    val dir = tmp()
    mk(dir)
    val v0 = LogTable.snapshot(spark, dir).version
    rename(dir, "v", "value"): Unit
    LogTable.updateWhere(spark, dir, col("k") === 1L,
      Map("value" -> lit(111L))): Unit
    LogTable.restore(spark, dir, v0): Unit
    val snap = LogTable.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "v", "p"))
    assert(snap.colMap.isEmpty, "the mapping reverts with the DDL")
    assert(LogTable.read(spark, dir).filter(col("k") === 1L)
      .select("v").as[Long].head() == 10L)
    // and restoring FORWARD to the renamed version re-applies the mapping
    LogTable.restore(spark, dir, v0 + 1): Unit
    assert(LogTable.read(spark, dir).columns.toSeq == Seq("k", "value", "p"))
  }

  test("structural columns refuse rename/drop loud") {
    val dir = tmp()
    mk(dir)
    val pe = intercept[IllegalArgumentException](rename(dir, "p", "part"))
    assert(pe.getMessage.contains("partition column"))
    // the refusal NAMES the sanctioned migration: evolve the spec off
    // the column first, then rename it as an ordinary column
    assert(pe.getMessage.contains("REPLACE PARTITIONED BY"))
    intercept[IllegalArgumentException](drop(dir, "p")): Unit
    // ... and that path WORKS: re-declare the spec, then the rename of
    // the now-ordinary column succeeds with history intact
    val mdir = tmp() + "/mig"
    mk(mdir)
    LogTable.evolvePartitioning(spark, mdir, Seq("k")): Unit
    rename(mdir, "p", "part"): Unit
    assert(LogTable.read(spark, mdir).columns.contains("part"))
    assert(LogTable.readWhere(spark, mdir,
      org.apache.spark.sql.functions.col("part") === "p1").count() > 0)
    LogTable.addConstraint(spark, dir, "v_nonneg", "v >= 0"): Unit
    val ce = intercept[IllegalArgumentException](rename(dir, "v", "value"))
    assert(ce.getMessage.contains("v_nonneg"))
    // generated-column source
    val gdir = tmp() + "/gen"
    LogTable.create(spark, gdir,
      Seq((java.sql.Date.valueOf("2024-03-01"), 1L))
        .toDF("odate", "x"), Seq("odate_year"),
      generatedColumns = Map("odate_year" -> "year(odate)"))
    val ge = intercept[IllegalArgumentException](
      rename(gdir, "odate", "order_date"))
    assert(ge.getMessage.contains("generated"))
    intercept[IllegalArgumentException](rename(gdir, "odate_year", "yy")): Unit
    // the new name may not shadow an at-rest physical name
    rename(dir, "k", "id"): Unit
    val se = intercept[IllegalArgumentException](rename(dir, "id", "p"))
    assert(se.getMessage.toLowerCase.contains("exists") ||
      se.getMessage.contains("physical"))
  }

  test("SQL dialect: RENAME COLUMN / DROP COLUMN, and colmap.* properties are reserved") {
    val dir = tmp()
    mk(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO value").collect(): Unit
    assert(LogTable.read(spark, dir).columns.contains("value"))
    // the bare relation provider cannot alias — fails loud, not wrong
    // (checked while the mapping is live, i.e. before the drop below
    // retires the only mapped column)
    val err = intercept[IllegalArgumentException] {
      spark.read.format(classOf[LogTableSourceProvider].getName)
        .option("path", dir).load()
    }
    assert(err.getMessage.contains("column mapping"))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN value").collect(): Unit
    assert(LogTable.read(spark, dir).columns.toSeq == Seq("k", "p"))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN IF EXISTS ghost")
      .collect(): Unit
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES " +
        "('colmap.map.x' = 'y')").collect(): Unit
    }
  }
}
