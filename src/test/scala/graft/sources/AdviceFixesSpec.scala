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
}
