package graft.sources

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generated partition columns: `PARTITIONED BY (year(ts))`-style
  * derivations — materialized on every write path (create, append,
  * upsert, merge, update), and PRUNED THROUGH on reads that bound only
  * the SOURCE column (the implied-conjunct rule).
  */
class GeneratedPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-gen").toString

  private def rows(n: Int) = (0 until n).map { i =>
    (i.toLong, Date.valueOf(s"${1995 + i % 4}-0${1 + i % 9}-15"), i * 10L)
  }.toDF("k", "odate", "v")

  private def mk(dir: String): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      LogTable.create(spark, dir, rows(80), Seq("odate_year"),
        statsCols = Seq("k"),
        generatedColumns = Map("odate_year" -> "year(odate)")): Unit
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("create materializes the derived column; appends may omit it") {
    val dir = tmp() + "/t"
    mk(dir)
    val schema = LogTable.read(spark, dir).schema
    assert(schema.fieldNames.toSeq == Seq("k", "odate", "v", "odate_year"))
    assert(LogTable.read(spark, dir)
      .filter(col("odate_year") =!= year(col("odate"))).count() == 0L)
    // a batch WITHOUT the derived column appends cleanly — recomputed
    LogTable.append(spark, dir,
      Seq((100L, Date.valueOf("1999-05-01"), 5L)).toDF("k", "odate", "v")): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 100L)
      .select("odate_year").as[Int].head() == 1999)
    // a batch with a WRONG supplied value is recomputed, never trusted
    LogTable.append(spark, dir,
      Seq((101L, Date.valueOf("1998-05-01"), 5L, 1234))
        .toDF("k", "odate", "v", "odate_year")): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 101L)
      .select("odate_year").as[Int].head() == 1998)
  }

  test("a source-column bound prunes files by the derived partition column") {
    val dir = tmp() + "/t"
    mk(dir)
    val total = LogTable.snapshot(spark, dir).files.length
    // the predicate mentions ONLY odate — the implication must exclude
    // every file whose odate_year range cannot reach 1995
    val r = LogTable.countWhere(spark, dir,
      col("odate") < Date.valueOf("1996-01-01"))
    assert(r.count == LogTable.read(spark, dir)
      .filter(col("odate") < Date.valueOf("1996-01-01")).count())
    assert(r.excludedFiles > 0,
      s"no files pruned by implication ($total files)")
    // range bounds imply through readWhere's pruning path too
    val scanned = LogTable.readWhere(spark, dir,
      col("odate") >= Date.valueOf("1997-01-01") &&
        col("odate") < Date.valueOf("1998-01-01")).count()
    assert(scanned == LogTable.read(spark, dir)
      .filter(year(col("odate")) === 1997).count())
  }

  test("SQL: CTAS with year() partitioning; pushed source filters prune the scan") {
    val root = tmp()
    val t = root + "/t"
    rows(80).createOrReplaceTempView("gen_src")
    spark.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (year(odate)) " +
      "STATS BY (k) AS SELECT * FROM gen_src"): Unit
    val snap = LogTable.snapshot(spark, t)
    assert(snap.partitionCols == Seq("odate_year"))
    assert(snap.properties.get("gen.odate_year").contains("year(odate)"))
    // a pushed filter on odate alone must scan fewer files than the
    // table (shuffle-free query: AQE stages would hide the scan node)
    val q = spark.sql(
      s"SELECT v FROM graft.`$t` WHERE odate < DATE'1996-01-01'")
    q.collect(): Unit
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val planRoot = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val numFiles = planRoot.collectFirst {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }
    assert(numFiles.isDefined)
    assert(numFiles.get < snap.files.length,
      s"scan read ${numFiles.get} of ${snap.files.length} files — " +
        "the source-column bound did not prune")
    // and the answer is right
    assert(spark.sql(s"SELECT sum(v) AS s FROM graft.`$t` " +
      "WHERE odate < DATE'1996-01-01'").head().getLong(0) == rows(80)
      .filter(col("odate") < Date.valueOf("1996-01-01"))
      .agg(sum("v")).as[Long].head())
  }

  test("merge derives the partition column from its source; updates re-derive") {
    val dir = tmp() + "/t"
    mk(dir)
    // merge source carries odate but NOT odate_year
    val src = Seq((0L, Date.valueOf("1995-01-15"), 999L))
      .toDF("k", "odate", "v")
    LogTable.mergeInto(spark, dir, src, Seq("k"))
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert()
      .run(): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 0L)
      .select("v").as[Long].head() == 999L)
    // an update that MOVES the source column re-derives the partition
    LogTable.updateWhere(spark, dir, col("k") === 0L,
      Map("odate" -> lit(Date.valueOf("2001-07-01")))): Unit
    assert(LogTable.read(spark, dir).filter(col("k") === 0L)
      .select("odate_year").as[Int].head() == 2001)
  }

  test("SQL: week(ts) partitioning derives a monotone date_trunc column") {
    val t = tmp() + "/t"
    rows(40).withColumn("ts", col("odate").cast("timestamp")).drop("odate")
      .createOrReplaceTempView("genweek_base")
    spark.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (week(ts)) " +
      "STATS BY (k) AS SELECT * FROM genweek_base"): Unit
    val snap = LogTable.snapshot(spark, t)
    assert(snap.partitionCols == Seq("ts_week"))
    assert(snap.properties.get("gen.ts_week")
      .contains("date_trunc('WEEK', ts)"))
    // the derived week never drifts, and a source bound prunes
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
      "WHERE ts_week <> date_trunc('WEEK', ts)").head().getLong(0) == 0L)
    val cw = LogTable.countWhere(spark, t,
      col("ts") < lit("1996-01-01").cast("timestamp"))
    assert(cw.count == rows(40).filter(col("odate") <
      Date.valueOf("1996-01-01")).count())
  }

  test("non-monotone generators are refused at create") {
    val dir = tmp() + "/bad"
    val e = intercept[IllegalArgumentException] {
      LogTable.create(spark, dir, rows(10), Seq("m"),
        generatedColumns = Map("m" -> "month(odate)")) // cyclic, not monotone
    }
    assert(e.getMessage.contains("vocabulary"))
    val e2 = intercept[IllegalArgumentException] {
      LogTable.create(spark, dir, rows(10), Seq("h"),
        generatedColumns = Map("h" -> "hash(odate)")) // bare hash: no N
    }
    assert(e2.getMessage.contains("vocabulary"))
  }

  test("bucket(N) hidden partitioning: point lookups open ~1/N files, ranges stay correct") {
    val dir = tmp() + "/bucketed"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      LogTable.create(spark, dir,
        (0L until 4000L).map(i => (i, i % 97, s"u$i")).toDF("k", "v", "uid"),
        Seq("k_bucket"), statsCols = Seq("v"),
        generatedColumns = Map("k_bucket" -> "pmod(hash(k), 16)"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val files = LogTable.snapshot(spark, dir).files.length
    assert(files >= 8, s"need a spread of bucket files, got $files")
    // POINT lookup on the high-cardinality source column: the implied
    // k_bucket equality must exclude most files — metadata-decided
    val r = LogTable.countWhere(spark, dir, col("k") === 1234L)
    assert(r.count == 1L)
    assert(r.excludedFiles > files / 2,
      s"bucket pruning must exclude most files (excluded=${r.excludedFiles}/$files)")
    // IN-list maps pointwise
    val rin = LogTable.countWhere(spark, dir,
      col("k").isin(1L, 2L, 3999L))
    assert(rin.count == 3L && rin.excludedFiles > 0)
    // RANGE predicate: bucket implications are OFF (non-monotone) — the
    // answer is still exact through the residual scan
    assert(LogTable.readWhere(spark, dir, col("k") < 100L).count() == 100L)
    // and the FileIndex path agrees with the metadata path
    assert(LogTable.read(spark, dir).filter(col("k") === 1234L)
      .count() == 1L)
  }
}
