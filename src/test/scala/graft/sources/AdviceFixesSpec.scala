package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Robustness fixes: non-finite per-file stats must never make a table
  * unreadable (colRanges declines the range instead of throwing on
  * BigDecimal("NaN")), nested-type ADD COLUMNS splits on TOP-level
  * commas only (angle-bracket depth), and the snapshot-cache witness
  * carries a content fingerprint so a same-(mtime,length) rewrite at
  * the same path still misses.
  */
class AdviceFixesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-advfix").toString

  test("NaN/Infinity in a tracked float/double stats column: reads and " +
    "catalog stats survive, the range declines, skipping keeps the file") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", Double.NaN), (2L, "p0", 5.0d),
          (3L, "p1", Double.PositiveInfinity), (4L, "p1", -3.5d))
        .toDF("k", "p", "x"),
      Seq("p"), statsCols = Seq("k", "x"))
    // the min/max stat strings for x render NaN/Infinity — the catalog
    // shell (table()) forces colRanges on every read; it must not throw
    val df = LogTable.table(spark, t)
    assert(df.count() == 4L)
    val snap = LogTable.snapshot(spark, t)
    val (mn, mx, _) = snap.colRanges("x")
    assert(mn.isEmpty && mx.isEmpty,
      "non-finite bounds must decline the catalog range, not render it")
    // a finite column in the same table still carries its range
    val (kmn, kmx, _) = snap.colRanges("k")
    assert(kmn.contains("1") && kmx.contains("4"))
    // SQL front door over the same snapshot stays green too
    assert(spark.sql(s"SELECT count(*) c FROM graft.`$t` WHERE x > 0")
      .head().getLong(0) == 3L) // NaN > 0 is TRUE in Spark SQL
  }

  test("ADD COLUMNS with multi-argument nested types splits on " +
    "top-level commas only") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (0L until 4L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
      "(m MAP<STRING,INT>, s STRUCT<a:INT,b:STRING>, note STRING)"): Unit
    val sch = LogTable.snapshot(spark, t).schema
    assert(sch.fieldNames.toSet.intersect(Set("m", "s", "note")).size == 3)
    assert(sch("m").dataType.simpleString == "map<string,int>")
    assert(sch("s").dataType.simpleString == "struct<a:int,b:string>")
    // the evolved table still reads (old rows NULL in the new columns)
    assert(LogTable.read(spark, t).filter(col("m").isNull).count() == 4L)
  }

  test("snapshot-cache witness: a same-length commit rewritten inside " +
    "the mtime granularity window still misses (content fingerprint)") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (0L until 4L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    val snap0 = LogTable.snapshot(spark, t) // populate the cache
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val commit = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .maxBy(_.getName)
    val st0 = fs.getFileStatus(commit)
    val bytes = {
      val in = fs.open(commit)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toByteArray
      } finally in.close()
    }
    // flip one digit of the in-commit ts (same length, same version) —
    // simulates a drop-and-recreate landing on identical (mtime,length)
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val TsField = """("ts":)(\d)""".r
    val mutated = TsField.findFirstMatchIn(s).map { m =>
      val digit = if (m.group(2) == "9") "8" else "9"
      s.substring(0, m.start) + m.group(1) + digit + s.substring(m.end)
    }.getOrElse(s)
    assert(mutated != s, "commit carries no ts to mutate?")
    assert(mutated.length == s.length)
    fs.delete(commit, false): Unit
    val out = fs.create(commit, true)
    try out.write(mutated.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.setTimes(commit, st0.getModificationTime, -1) // same mtime:length
    val st1 = fs.getFileStatus(commit)
    assert(st1.getModificationTime == st0.getModificationTime &&
      st1.getLen == st0.getLen, "collision setup failed")
    val snap1 = LogTable.snapshot(spark, t)
    assert(snap1.commitTs != snap0.commitTs,
      "an (mtime,length) collision served the stale cached snapshot")
  }

  test("MERGE INTO under cdc.enabled evaluates non-deterministic SET " +
    "expressions ONCE: the CDC post-image matches the committed rows") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 50L).map(k => (k, "p0", 0L)).toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.CdcProp -> "true"))
    val v = LogTable.mergeInto(spark, t,
      (1L to 50L).map(k => (k, "p0")).toDF("k", "p"), Seq("k"))
      .whenMatchedUpdate(
        Map("cents" -> "CAST(rand() * 1000000000 AS BIGINT)"))
      .run()
    val post = LogTable.readCommitChanges(spark, t, v - 1, v)
      .filter(col("_change_type") === "update_postimage")
      .select("k", "cents")
    val now = LogTable.read(spark, t).select("k", "cents")
    assert(post.count() == 50L)
    assert(post.exceptAll(now).count() == 0 &&
      now.exceptAll(post).count() == 0,
      "the feed's post-image re-ran the non-deterministic merge " +
        "projection instead of reading the committed values")
    // the insert path pins too (rand in an INSERT VALUES expression)
    val v2 = LogTable.mergeInto(spark, t,
      Seq((99L, "p0")).toDF("k", "p"), Seq("k"))
      .whenNotMatchedInsert(
        Map("cents" -> "CAST(rand() * 1000000000 AS BIGINT)"))
      .run()
    val ins = LogTable.readCommitChanges(spark, t, v2 - 1, v2)
      .filter(col("_change_type") === "insert").select("k", "cents")
    val row99 = LogTable.read(spark, t).filter(col("k") === 99L)
      .select("k", "cents")
    assert(ins.exceptAll(row99).count() == 0 &&
      row99.exceptAll(ins).count() == 0,
      "insert-image diverged from the committed row")
  }

  test("hiveFillOn: a no-match path extract stays NULL — an in-data " +
    "NULL in a STRING convert.hive column never becomes empty string") {
    import org.apache.spark.sql.types._
    val df = Seq(
      ("flatnull", null.asInstanceOf[String], "/w/part-0.parquet"),
      ("dirfill", null.asInstanceOf[String], "/w/p=dir%20x/part-1.parquet"),
      ("indata", "win", "/w/p=other/part-2.parquet"))
      .toDF("v", "p", "fp")
    val out = LogTable.hiveFillOn(
      StructType(Seq(StructField("v", StringType),
        StructField("p", StringType))),
      Seq("p"), df, col("fp"))
      .select("v", "p").as[(String, String)].collect().toMap
    assert(out("flatnull") == null,
      s"flat-file NULL must stay NULL, got '${out("flatnull")}'")
    assert(out("dirfill") == "dir x", s"directory fill: ${out("dirfill")}")
    assert(out("indata") == "win", "in-data values win")
  }

  test("readCommitChanges: a parent snapshot lost behind the horizon " +
    "gets the friendly expired-window error, not a raw replay failure") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 20L).map(k => (k, "p0", k * 10L)).toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"))                         // v1
    LogTable.append(spark, t,
      Seq((21L, "p0", 210L)).toDF("k", "p", "cents")): Unit   // v2
    LogTable.deleteWhere(spark, t, col("k") <= 5): Unit       // v3 removes
    // surgically expire v1-v2 with NO checkpoint: commit 3 is readable
    // but its parent snapshot is not — exactly the raw-replay hole
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    Seq(1L, 2L).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        t + f"/_graft_log/$v%020d.json"), false): Unit
    }
    val e = intercept[IllegalStateException] {
      LogTable.readCommitChanges(spark, t, 2L, 3L).collect()
    }
    assert(e.getMessage.contains("expired behind a checkpoint"),
      e.getMessage)
  }

  test("graft_changes has ONE output schema: the file-level shape " +
    "carries _commit_version (NULL), and the mode argument pins the " +
    "granularity explicitly") {
    import graft.expr.GraftExtensions
    org.apache.spark.sql.GraftBridge.installFunctions(spark,
      new GraftExtensions().apply)
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", 10L), (2L, "p0", 20L)).toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"))
    spark.sql(s"UPDATE graft.`$t` SET cents = cents + 1 WHERE k = 1"): Unit
    // file-level (non-cdc table): same column set as the row-level feed
    val file = spark.sql(s"SELECT * FROM graft_changes('$t', 1, 2)")
    assert(file.columns.contains("_commit_version"),
      file.columns.mkString(","))
    assert(file.filter(col("_commit_version").isNotNull).count() == 0,
      "a net diff is not attributable to one commit — NULL, not a guess")
    // mode 'row' serves the per-commit feed on ANY table (file-level
    // per-commit fallback), version-attributed
    val row = spark.sql(s"SELECT * FROM graft_changes('$t', 1, 2, 'row')")
    assert(row.columns.sorted.toSeq == file.columns.sorted.toSeq,
      "one schema for every mode")
    assert(row.filter(col("_commit_version") =!= 2L).count() == 0)
    // mode 'file' pins the net shape even on a cdc table
    val t2 = tmp() + "/t2"
    LogTable.create(spark, t2,
      Seq((1L, "p0", 10L)).toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.CdcProp -> "true"))
    spark.sql(s"UPDATE graft.`$t2` SET cents = 11 WHERE k = 1"): Unit
    val pinned = spark.sql(
      s"SELECT * FROM graft_changes('$t2', 1, 2, 'file')")
    assert(pinned.filter(col("_commit_version").isNotNull).count() == 0)
    val auto = spark.sql(s"SELECT * FROM graft_changes('$t2', 1, 2)")
    assert(auto.filter(col("_change_type") === "update_postimage")
      .count() == 1L, "auto on a cdc table serves the row-level feed")
    val bad = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$t2', 1, 2, 'nope')").collect())
    assert(bad.getMessage.contains("unknown mode"), bad.getMessage)
  }
}
