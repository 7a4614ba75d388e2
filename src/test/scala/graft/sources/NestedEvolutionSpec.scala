package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.catalog.TableChange

import graft.SparkSpec

/** NESTED (struct-field) schema evolution — the dotted-path extension
  * of column mapping: ADD/RENAME/DROP/WIDEN a field INSIDE a struct
  * column rewrites zero files; the logical leaf maps to a stable
  * physical name under the parent's PHYSICAL dotted path
  * (`colmap.nest.*`), per-file stats key nested columns by dotted
  * physical path, and reads rebuild the struct under logical names at
  * exit (NULL structs stay NULL).
  */
class NestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-nest").toString

  /** A table whose `meta` struct carries (ua, ip, score) with per-file
    * stats on the nested score — cluster-sorted so ranges are tight.
    */
  private def mk(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val df = (0L until 40L).map(i =>
        (i, s"p${i % 4}", s"ua$i", s"10.0.0.$i", i * 3))
        .toDF("k", "p", "ua", "ip", "score")
        .select(col("k"), col("p"),
          struct(col("ua"), col("ip"), col("score")).as("meta"))
      LogTable.create(spark, dir, df, Seq("p"),
        statsCols = Seq("k", "meta.score"), clusterBy = Seq("k"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def rename(dir: String, path: Array[String], to: String): Long =
    LogTable.evolveSchema(spark, dir,
      Seq(TableChange.renameColumn(path, to)))

  test("nested rename is metadata-only: zero files touched, struct " +
    "rebuilt logical at exit, old versions time-travel under old shape") {
    val dir = tmp()
    mk(dir)
    val before = LogTable.snapshot(spark, dir)
    rename(dir, Array("meta", "ua"), "agent"): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.files.map(_.name).sorted == before.files.map(_.name).sorted,
      "a nested rename must not touch a single data file")
    assert(after.nestMaps == Map("meta" -> Map("agent" -> "ua")))
    val df = LogTable.read(spark, dir)
    assert(df.select("meta.agent").as[String].collect().sorted.head == "ua0")
    assert(df.filter(col("meta.agent") === "ua7").count() == 1L)
    // physical schema still speaks `ua` (the at-rest name never moves)
    assert(after.physicalSchema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.contains("ua"))
    // the BARE provider (no alias projection) refuses a nested-mapped
    // table — serving physical leaf names would be a silent mis-read
    val bp = intercept[IllegalArgumentException] {
      spark.read.format(classOf[LogTableSourceProvider].getName)
        .option("path", dir).load()
    }
    assert(bp.getMessage.contains("column mapping"))
    // time travel: the pre-rename version answers under the OLD shape
    val old = LogTable.read(spark, dir, asOf = Some(before.version))
    assert(old.select("meta.ua").as[String].collect().length == 40)
  }

  test("nested stats skipping survives the rename: predicates on the " +
    "NEW leaf prune through the retired dotted physical stats key") {
    val dir = tmp()
    mk(dir)
    // stats live under `meta.score`; rename the leaf and prune anyway
    rename(dir, Array("meta", "score"), "pts"): Unit
    val r = LogTable.countWhere(spark, dir, col("meta.pts") === 21L)
    assert(r.count == 1L)
    assert(r.excludedFiles > 0,
      s"nested predicate must prune via dotted stats (excluded=${r.excludedFiles})")
    // a provably-empty predicate over the renamed leaf decides on
    // metadata alone
    val none = LogTable.countWhere(spark, dir, col("meta.pts") > 1000000L)
    assert(none.count == 0L && none.scannedFiles == 0,
      s"metadata-only decision expected (scanned=${none.scannedFiles})")
  }

  test("nested drop tombstones the physical path; a re-added field gets " +
    "a fresh physical name and never resurrects old values") {
    val dir = tmp()
    mk(dir)
    val before = LogTable.snapshot(spark, dir)
    LogTable.evolveSchema(spark, dir,
      Seq(TableChange.deleteColumn(Array("meta", "ip"), false))): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.files.map(_.name).sorted == before.files.map(_.name).sorted)
    assert(!LogTable.read(spark, dir).select("meta.*").columns.contains("ip"))
    assert(after.droppedPhysicals.contains("meta.ip"))
    // re-ADD under the same logical name: fresh physical, old rows NULL
    LogTable.evolveSchema(spark, dir, Seq(TableChange.addColumn(
      Array("meta", "ip"), org.apache.spark.sql.types.StringType, true))): Unit
    val re = LogTable.read(spark, dir)
    assert(re.filter(col("meta.ip").isNotNull).count() == 0L,
      "a re-added nested field must NOT resurrect pre-drop values")
    assert(LogTable.snapshot(spark, dir)
      .nestMaps("meta").keys.exists(_.equalsIgnoreCase("ip")))
  }

  test("rename-then-widen of a nested field: the widened leaf reads old " +
    "files up-cast; appends align recursively") {
    val dir = tmp()
    mk(dir)
    rename(dir, Array("meta", "score"), "pts"): Unit
    LogTable.evolveSchema(spark, dir, Seq(TableChange.updateColumnType(
      Array("meta", "pts"), org.apache.spark.sql.types.LongType))): Unit
    val df = LogTable.read(spark, dir)
    assert(df.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("pts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.agg(sum(col("meta.pts"))).as[Long].head() ==
      (0L until 40L).map(_ * 3).sum)
    // an old-shape batch (narrower leaf, logical names) aligns in
    val batch = Seq((100L, "p0", "uaX", "1.2.3.4", 999))
      .toDF("k", "p", "agent", "ip", "score")
      .select(col("k"), col("p"),
        struct(col("agent").as("ua2"), col("ip"),
          col("score").as("pts")).as("meta"))
    // note: batch speaks the CURRENT logical shape (ua2 is wrong name)
    intercept[IllegalArgumentException] {
      LogTable.append(spark, dir, batch): Unit
    }
    val good = Seq((100L, "p0", "uaX", "1.2.3.4", 999))
      .toDF("k", "p", "ua", "ip", "score")
      .select(col("k"), col("p"),
        struct(col("ua"), col("ip"),
          col("score").cast("int").as("pts")).as("meta"))
    LogTable.append(spark, dir, good): Unit
    assert(LogTable.read(spark, dir)
      .filter(col("meta.pts") === 999L).count() == 1L)
  }

  test("nested ADD with DEFAULT: old rows NULL, an old-shape batch " +
    "fills the default, a supplied value wins") {
    val dir = tmp()
    mk(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(meta.src STRING DEFAULT 'etl')"): Unit
    val snap = LogTable.snapshot(spark, dir)
    assert(snap.properties.get("coldefault.meta.src").contains("'etl'"))
    // metadata-only: pre-existing rows read NULL
    assert(LogTable.read(spark, dir)
      .filter(col("meta.src").isNotNull).count() == 0L)
    // a batch whose struct OMITS the field fills the default
    val oldShape = Seq((200L, "p1", "uaY", "2.3.4.5", 7L))
      .toDF("k", "p", "ua", "ip", "score")
      .select(col("k"), col("p"),
        struct(col("ua"), col("ip"), col("score")).as("meta"))
    LogTable.append(spark, dir, oldShape): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 200L)
      .select("meta.src").as[String].head() == "etl")
    // a batch SUPPLYING it keeps its value
    val newShape = Seq((201L, "p1", "uaZ", "3.4.5.6", 8L, "manual"))
      .toDF("k", "p", "ua", "ip", "score", "src")
      .select(col("k"), col("p"),
        struct(col("ua"), col("ip"), col("score"), col("src")).as("meta"))
    LogTable.append(spark, dir, newShape): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 201L)
      .select("meta.src").as[String].head() == "manual")
  }

  test("RESTORE crosses a nested rename atomically: DDL, nested mapping " +
    "and defaults revert together") {
    val dir = tmp()
    mk(dir)
    val v0 = LogTable.snapshot(spark, dir).version
    rename(dir, Array("meta", "ua"), "agent"): Unit
    spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
      "(meta.src STRING DEFAULT 'etl')"): Unit
    assert(LogTable.snapshot(spark, dir).nestMaps.nonEmpty)
    LogTable.restore(spark, dir, v0): Unit
    val snap = LogTable.snapshot(spark, dir)
    assert(snap.nestMaps.isEmpty, "the nested mapping must revert")
    assert(!snap.properties.keys.exists(_.startsWith("coldefault.")),
      "the nested default must revert")
    val cols = LogTable.read(spark, dir).select("meta.*").columns.toSeq
    assert(cols == Seq("ua", "ip", "score"))
    assert(LogTable.read(spark, dir)
      .filter(col("meta.ua") === "ua7").count() == 1L)
  }

  test("NULL structs stay NULL through the nested-rename rebuild") {
    val dir = tmp()
    val df = Seq((1L, "p0", Some(("a", 1L))), (2L, "p0", None))
      .toDF("k", "p", "m0")
      .select(col("k"), col("p"),
        when(col("m0").isNotNull,
          struct(col("m0._1").as("tag"), col("m0._2").as("n")))
          .as("meta"))
    LogTable.create(spark, dir, df, Seq("p"), statsCols = Seq("k"))
    rename(dir, Array("meta", "tag"), "label"): Unit
    val out = LogTable.read(spark, dir)
    assert(out.filter(col("meta").isNull).count() == 1L,
      "a NULL struct must not become a struct of NULLs")
    assert(out.filter(col("meta.label") === "a").count() == 1L)
  }

  test("ARRAY OF STRUCTS evolves through the `element` segment: rename/" +
    "add/drop are metadata-only, old files read under the mapping, an " +
    "old-shape append DEFAULT-fills per element, parent renames keep " +
    "element keys") {
    val dir = tmp()
    val df = (0L until 12L).map { i =>
      (i, s"p${i % 2}", Seq((s"t$i", i), (s"u$i", i * 2)))
    }.toDF("k", "p", "raw")
      .select(col("k"), col("p"), expr(
        "transform(raw, x -> named_struct('tag', x._1, 'n', x._2))")
        .as("tags"))
    LogTable.create(spark, dir, df, Seq("p"), statsCols = Seq("k"))
    val before = LogTable.snapshot(spark, dir)
    // rename a field INSIDE the array elements — zero files touched
    rename(dir, Array("tags", "element", "tag"), "label"): Unit
    val after = LogTable.snapshot(spark, dir)
    assert(after.files.map(_.name).sorted == before.files.map(_.name).sorted,
      "nested-array rename must rewrite nothing")
    val out = LogTable.read(spark, dir)
    assert(out.schema("tags").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("label", "n"))
    assert(out.select(explode(col("tags")).as("t"))
      .filter(col("t.label") === "t3").count() == 1L)
    // time travel: the pre-rename version still reads the OLD shape
    val old = LogTable.read(spark, dir, asOf = Some(before.version))
    assert(old.select(explode(col("tags")).as("t"))
      .filter(col("t.tag") === "t3").count() == 1L)
    // ADD a field inside the elements, with a write-side DEFAULT
    LogTable.evolveSchema(spark, dir, Seq(TableChange.addColumn(
      Array("tags", "element", "w"),
      org.apache.spark.sql.types.LongType, true)),
      defaults = Map("tags.element.w" -> "7")): Unit
    // an OLD-SHAPE append (elements lack `w`) DEFAULT-fills per element
    val oldShape = Seq((100L, "p0", Seq(("zz", 5L))))
      .toDF("k", "p", "raw")
      .select(col("k"), col("p"), expr(
        "transform(raw, x -> named_struct('label', x._1, 'n', x._2))")
        .as("tags"))
    LogTable.append(spark, dir, oldShape): Unit
    val filled = LogTable.read(spark, dir)
      .filter(col("k") === 100L)
      .select(explode(col("tags")).as("t")).select("t.label", "t.n", "t.w")
      .as[(String, Long, Long)].collect().toSeq
    assert(filled == Seq(("zz", 5L, 7L)), s"default fill, got $filled")
    // existing rows NULL-fill the added element field at read
    assert(LogTable.read(spark, dir).filter(col("k") === 3L)
      .select(explode(col("tags")).as("t")).filter(col("t.w").isNull)
      .count() == 2L)
    // rename the PARENT column — element keys scope by PHYSICAL path,
    // so they survive
    rename(dir, Array("tags"), "entries"): Unit
    assert(LogTable.read(spark, dir)
      .select(explode(col("entries")).as("t"))
      .filter(col("t.label") === "t3").count() == 1L)
    // DROP the renamed element field — metadata-only, tombstoned
    LogTable.evolveSchema(spark, dir, Seq(TableChange.deleteColumn(
      Array("entries", "element", "label"), false))): Unit
    val shape = LogTable.read(spark, dir).schema("entries").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(shape == Seq("n", "w"), s"dropped field must vanish, got $shape")
    // a BARE array path (no element segment) refuses with the pointer
    val e = intercept[IllegalArgumentException] {
      rename(dir, Array("entries", "n"), "m"): Unit
    }
    assert(e.getMessage.contains("element"), e.getMessage)
  }

  test("refusals: evolution through arrays/maps, constraint references, " +
    "last-field drop") {
    val dir = tmp()
    val df = Seq((1L, "p0", Seq("x"), ("a", 2L)))
      .toDF("k", "p", "tags", "m0")
      .select(col("k"), col("p"), col("tags"),
        struct(col("m0._1").as("tag"), col("m0._2").as("n")).as("meta"))
    LogTable.create(spark, dir, df, Seq("p"), statsCols = Seq("k"))
    // through an array: refuse
    intercept[IllegalArgumentException] {
      rename(dir, Array("tags", "element"), "e"): Unit
    }
    // a CHECK constraint referencing the nested path blocks rename/drop
    LogTable.addConstraint(spark, dir, "tag_ok", "meta.tag IS NOT NULL"): Unit
    intercept[IllegalArgumentException] {
      rename(dir, Array("meta", "tag"), "label"): Unit
    }
    intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, dir,
        Seq(TableChange.deleteColumn(Array("meta", "tag"), false))): Unit
    }
    LogTable.dropConstraint(spark, dir, "tag_ok"): Unit
    // last field of a struct: drop the struct column instead
    LogTable.evolveSchema(spark, dir,
      Seq(TableChange.deleteColumn(Array("meta", "tag"), false))): Unit
    intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, dir,
        Seq(TableChange.deleteColumn(Array("meta", "n"), false))): Unit
    }
  }

  test("CDF and the STREAMING source read a nested-renamed table under " +
    "logical names (files at rest keep physical leaves)") {
    val dir = tmp()
    mk(dir)
    rename(dir, Array("meta", "ua"), "agent"): Unit
    val vPre = LogTable.latestVersion(spark, dir)
    LogTable.append(spark, dir,
      Seq((500L, "p0", "uaNEW", "9.9.9.9", 7L))
        .toDF("k", "p", "ua", "ip", "score")
        .select(col("k"), col("p"),
          struct(col("ua").as("agent"), col("ip"),
            col("score")).as("meta"))): Unit
    // CDF: the change feed rebuilds structs logical-named
    val ch = LogTable.readChanges(spark, dir, vPre, vPre + 1L)
    assert(ch.filter(col("_change_type") === "insert")
      .select("meta.agent").as[String].collect().toSeq == Seq("uaNEW"))
    // streaming: one AvailableNow pass over the table's change feed
    val out = java.nio.file.Files.createTempDirectory("graft-nest-st")
    val q = spark.readStream.format(classOf[LogTableSourceProvider].getName)
      .option("path", dir).load()
      .select(col("k"), col("meta.agent").as("agent"))
      .writeStream.format("parquet")
      .option("path", out.toString + "/data")
      .option("checkpointLocation", out.toString + "/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out.toString + "/data")
    assert(got.count() == 41L)
    assert(got.filter(col("agent") === "uaNEW").count() == 1L)
    assert(got.filter(col("agent") === "ua7").count() == 1L)
  }

  test("hidden partitioning from a NESTED source: year(meta.ts) " +
    "materializes, a bound on meta.ts alone prunes, evolution refuses " +
    "to touch the source or its parent") {
    val dir = tmp()
    val df = (0L until 36L).map { i =>
      (i, java.sql.Date.valueOf(s"${2020 + (i % 3)}-0${1 + (i % 9)}-01"),
        s"ua$i")
    }.toDF("k", "d", "ua")
      .select(col("k"), struct(col("d").as("ts"), col("ua")).as("meta"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      LogTable.create(spark, dir, df, Seq("d_year"), statsCols = Seq("k"),
        generatedColumns = Map("d_year" -> "year(meta.ts)"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(LogTable.read(spark, dir)
      .filter(col("d_year") =!= year(col("meta.ts"))).count() == 0L,
      "the derived column must equal its nested source's projection")
    // a predicate on the NESTED SOURCE alone prunes through the implied
    // bound on the derived partition column
    val pr = LogTable.countWhere(spark, dir,
      col("meta.ts") < lit("2021-01-01").cast("date"))
    assert(pr.count == 12L)
    assert(pr.excludedFiles > 0,
      s"nested-source bound must prune (excluded=${pr.excludedFiles})")
    // the generator's source is structural: neither the leaf nor its
    // PARENT struct may rename/drop away
    intercept[IllegalArgumentException] {
      rename(dir, Array("meta", "ts"), "when"): Unit
    }
    intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, dir, Seq(
        org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
          Array("meta"), "m"))): Unit
    }
    // an append omitting the derived column recomputes it
    LogTable.append(spark, dir,
      Seq((100L, java.sql.Date.valueOf("2022-05-01"), "uaX"))
        .toDF("k", "d", "ua")
        .select(col("k"), struct(col("d").as("ts"), col("ua")).as("meta"))): Unit
    assert(LogTable.read(spark, dir)
      .filter(col("k") === 100L).select("d_year").head().getInt(0) == 2022)
  }

  test("SQL dialect routes: RENAME/DROP/ADD/ALTER COLUMN with dotted " +
    "paths, and the whole shape round-trips through SQL reads") {
    val dir = tmp()
    mk(dir)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN meta.ua TO agent"): Unit
    spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN meta.ip"): Unit
    spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN meta.score TYPE BIGINT"): Unit
    val row = spark.sql(
      s"SELECT meta.agent AS a, meta.score AS s FROM graft.`$dir` " +
        "WHERE k = 3").head()
    assert(row.getString(0) == "ua3" && row.getLong(1) == 9L)
    val cols = spark.sql(s"SELECT meta.* FROM graft.`$dir`").columns.toSeq
    assert(cols == Seq("agent", "score"))
    // CTAS declares DOTTED stats straight from SQL
    val t2 = tmp() + "/sqlstats"
    spark.sql(s"SELECT k, p, meta FROM graft.`$dir`")
      .createOrReplaceTempView("nest_src")
    spark.sql(s"CREATE TABLE graft.`$t2` PARTITIONED BY (p) " +
      "STATS BY (k, meta.score) AS SELECT * FROM nest_src"): Unit
    val pr = LogTable.countWhere(spark, t2, col("meta.score") > 1000000L)
    assert(pr.count == 0L && pr.scannedFiles == 0,
      "SQL-declared dotted stats must skip metadata-only")
  }

  test("UPDATE assigns NESTED fields: API, SQL with dotted SET, and the " +
    "deletion-vector path; NULL structs stay NULL; unknowns refuse") {
    val dir = tmp()
    mk(dir)
    // API: rewrite path — only matched rows' leaf changes, siblings keep
    LogTable.updateWhere(spark, dir, col("k") === 3L,
      Map("meta.score" -> lit(999L))): Unit
    val r3 = LogTable.read(spark, dir).filter(col("k") === 3L)
      .select("meta.ua", "meta.score").head()
    assert(r3.getString(0) == "ua3" && r3.getLong(1) == 999L)
    assert(LogTable.read(spark, dir)
      .filter(col("meta.score") === 12L).count() == 1L, "k=4 untouched")
    // SQL: dotted SET target
    spark.sql(s"UPDATE graft.`$dir` SET meta.score = meta.score + 1 " +
      "WHERE k = 5"): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 5L)
      .select("meta.score").head().getLong(0) == 16L)
    // DV path: the matched rows rewrite with the leaf assigned
    LogTable.updateWhere(spark, dir, col("k") === 6L,
      Map("meta.ua" -> lit("patched")), deletionVectors = true): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 6L)
      .select("meta.ua").head().getString(0) == "patched")
    // after a RENAME the assignment speaks the NEW logical name
    rename(dir, Array("meta", "score"), "pts"): Unit
    LogTable.updateWhere(spark, dir, col("k") === 7L,
      Map("meta.pts" -> lit(777L))): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 7L)
      .select("meta.pts").head().getLong(0) == 777L)
    // unknown nested target refuses loud
    intercept[IllegalArgumentException] {
      LogTable.updateWhere(spark, dir, col("k") === 1L,
        Map("meta.nope" -> lit(1))): Unit
    }
  }

  test("MERGE INTO assigns nested fields — API clauses and SQL dotted " +
    "SET targets; whole-struct and leaf assignments coexist") {
    val dir = tmp()
    mk(dir)
    val src = Seq((3L, "p3", 500L), (100L, "p0", 7L))
      .toDF("k", "p", "bump")
    LogTable.mergeInto(spark, dir, src, Seq("k"))
      .whenMatchedUpdate(Map("meta.score" -> "t.meta.score + s.bump"))
      .run(): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 3L)
      .select("meta.score").head().getLong(0) == 509L)
    assert(LogTable.read(spark, dir).filter(col("k") === 4L)
      .select("meta.score").head().getLong(0) == 12L, "k=4 untouched")
    // SQL MERGE with a dotted SET target
    Seq((5L, "p1", 1000L)).toDF("k", "p", "bump")
      .createOrReplaceTempView("nest_merge_src")
    spark.sql(s"MERGE INTO graft.`$dir` t USING nest_merge_src s " +
      "ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET meta.score = t.meta.score + s.bump"): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 5L)
      .select("meta.score").head().getLong(0) == 1015L)
    // sibling leaves survive an adjacent-leaf assignment
    assert(LogTable.read(spark, dir).filter(col("k") === 5L)
      .select("meta.ua").head().getString(0) == "ua5")
    // unknown nested target refuses loud
    intercept[IllegalArgumentException] {
      LogTable.mergeInto(spark, dir, src, Seq("k"))
        .whenMatchedUpdate(Map("meta.nope" -> "1")).run(): Unit
    }
  }

  test("a SHALLOW CLONE of a nested-renamed table reads logical names " +
    "through the source's physical files") {
    val dir = tmp()
    mk(dir)
    rename(dir, Array("meta", "score"), "pts"): Unit
    val dst = tmp() + "/clone"
    LogTable.clone(spark, dir, dst): Unit
    val got = LogTable.read(spark, dst)
    assert(got.select("meta.*").columns.toSeq == Seq("ua", "ip", "pts"))
    assert(got.agg(sum(col("meta.pts"))).as[Long].head() ==
      (0L until 40L).map(_ * 3).sum)
    // skipping through the retired dotted key works on the clone too
    val pr = LogTable.countWhere(spark, dst, col("meta.pts") > 1000000L)
    assert(pr.count == 0L && pr.scannedFiles == 0)
    // diverge the clone: its own nested evolution never touches the src
    LogTable.evolveSchema(spark, dst, Seq(
      TableChange.renameColumn(Array("meta", "ua"), "agent"))): Unit
    assert(LogTable.read(spark, dst).select("meta.*").columns.contains("agent"))
    assert(LogTable.read(spark, dir).select("meta.*").columns.contains("ua"))
  }

  test("MAP OF STRUCTS evolves through the `value` segment: rename, " +
    "add-with-default and widen are metadata-only — zero files " +
    "rewritten — and time travel reads the old value shape") {
    val dir = tmp()
    val df = Seq(
      (1L, "p0", Map("a" -> (("ua0", 1L)), "b" -> (("ua1", 2L)))),
      (2L, "p1", Map("c" -> (("ua2", 3L)))))
      .toDF("k", "p", "m0")
      .select(col("k"), col("p"),
        transform_values(col("m0"), (_, v) =>
          struct(v.getField("_1").as("ua"), v.getField("_2").as("score")))
          .as("props"))
    LogTable.create(spark, dir, df, Seq("p"), statsCols = Seq("k"))
    val filesPre = LogTable.snapshot(spark, dir).files.map(_.name).toSet
    // RENAME a field inside the map's value struct
    LogTable.evolveSchema(spark, dir, Seq(TableChange.renameColumn(
      Array("props", "value", "ua"), "agent"))): Unit
    // ADD a defaulted field + WIDEN an existing one
    LogTable.evolveSchema(spark, dir, Seq(
      TableChange.addColumn(Array("props", "value", "note"),
        org.apache.spark.sql.types.StringType, true))): Unit
    val vNow = LogTable.latestVersion(spark, dir)
    assert(LogTable.snapshot(spark, dir).files.map(_.name).toSet ==
      filesPre, "nested map evolution must be metadata-only")
    // the read serves the NEW shape off the OLD files
    val got = LogTable.read(spark, dir)
      .select(explode(col("props")).as(Seq("mk", "mv")))
      .select(col("mk"), col("mv.agent"), col("mv.score"), col("mv.note"))
      .as[(String, String, Long, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", "ua0", 1L, None), ("b", "ua1", 2L, None),
      ("c", "ua2", 3L, None)), got.mkString(","))
    // a NEW-shape append round-trips; old files still NULL-fill note
    LogTable.append(spark, dir,
      Seq((3L, "p0", Map("d" -> (("ua3", 4L, "hi")))))
        .toDF("k", "p", "m0")
        .select(col("k"), col("p"),
          transform_values(col("m0"), (_, v) =>
            struct(v.getField("_1").as("agent"),
              v.getField("_2").as("score"),
              v.getField("_3").as("note"))).as("props"))): Unit
    val d = LogTable.read(spark, dir).filter(col("k") === 3L)
      .select(explode(col("props")).as(Seq("mk", "mv")))
      .select(col("mv.agent"), col("mv.note"))
      .as[(String, String)].head()
    assert(d == ("ua3", "hi"))
    // TIME TRAVEL: the pre-evolution version serves the OLD value shape
    val old = LogTable.read(spark, dir, asOf = Some(vNow - 2L))
    assert(old.select(explode(col("props")).as(Seq("mk", "mv")))
      .select("mv.ua").as[String].collect().sorted.toSeq ==
      Seq("ua0", "ua1", "ua2"))
    // direct map access without `value` refuses with a pointer
    val e = intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, dir, Seq(TableChange.renameColumn(
        Array("props", "agent"), "x"))): Unit
    }
    assert(e.getMessage.contains("value"), e.getMessage)
  }
}
