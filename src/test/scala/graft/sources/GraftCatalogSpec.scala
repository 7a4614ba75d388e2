package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 TableCatalog: log tables addressed BY NAME through every
  * SQL surface — create/insert/merge/delete/update, time travel, the
  * lifecycle dialect, schema evolution, namespaces — all resolving
  * through the SAME snapshot/FileIndex plan as the `graft.`path`` form
  * (the one-read-path discipline), with Spark's generic V2 exec paths
  * locked out by the capability-less table handle.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // ONE root for the suite: CatalogManager caches the catalog instance
  // after first load, so re-pointing `root` mid-session has no effect —
  // the same contract a production session lives with
  private lazy val catalogRoot: String = {
    val root = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.root", root)
    root
  }
  private def register(): String = catalogRoot

  test("CTAS / INSERT / SELECT / DELETE / UPDATE by name, one read path") {
    val root = register()
    spark.sql("CREATE NAMESPACE lake.db")
    spark.sql(
      "CREATE TABLE lake.db.orders PARTITIONED BY (p) AS " +
        "SELECT id AS k, id * 100 AS cents, " +
        "concat('p', cast(id % 3 AS string)) AS p FROM range(30)")
    assert(new java.io.File(s"$root/db/orders/_graft_log").isDirectory,
      "the named table must live under the catalog root")
    assert(spark.sql("SELECT count(*) AS n FROM lake.db.orders")
      .as[Long].head() == 30L)
    // the NAME and the PATH form must be the same relation (same plan)
    val byPath = spark.sql(s"SELECT * FROM graft.`$root/db/orders`")
    assert(spark.table("lake.db.orders").count() == byPath.count())
    spark.sql("INSERT INTO lake.db.orders " +
      "SELECT id + 100, 1, 'p0' FROM range(5)")
    assert(spark.sql("SELECT count(*) AS n FROM lake.db.orders")
      .as[Long].head() == 35L)
    spark.sql("DELETE FROM lake.db.orders WHERE k >= 100")
    spark.sql("UPDATE lake.db.orders SET cents = cents + 7 WHERE k = 0")
    assert(spark.sql(
      "SELECT cents FROM lake.db.orders WHERE k = 0")
      .as[Long].head() == 7L)
    // the scan behind the name IS the log-table FileIndex plan
    val plan = spark.table("lake.db.orders").queryExecution.analyzed
    val viaIndex = plan.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) if fs.location.isInstanceOf[LogTableFileIndex] => ()
    }
    assert(viaIndex.isDefined, "named read must plan through LogTableFileIndex")
  }

  test("MERGE, time travel, DESCRIBE HISTORY/DETAIL and VACUUM by name") {
    register()
    spark.sql("CREATE TABLE lake.m PARTITIONED BY (p) AS " +
      "SELECT id AS k, id AS v, 'a' AS p FROM range(4)")
    spark.createDataFrame(Seq((2L, 99L, "a"), (9L, 9L, "a")))
      .toDF("k", "v", "p").createOrReplaceTempView("src_m")
    spark.sql(
      """MERGE INTO lake.m t USING src_m s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT sum(v) AS s FROM lake.m").as[Long].head() ==
      (0L + 1L + 99L + 3L + 9L))
    // VERSION AS OF through the name sees the pre-merge state
    assert(spark.sql("SELECT sum(v) AS s FROM lake.m VERSION AS OF 1")
      .as[Long].head() == 6L)
    val hist = spark.sql("DESCRIBE HISTORY lake.m").collect()
    assert(hist.map(_.getString(1)).contains("MERGE_INTO"))
    val detail = spark.sql("DESCRIBE DETAIL lake.m").head()
    assert(detail.getAs[String]("partition_columns") == "p")
    // the ledger as a TVF — filterable in-query, names resolve too
    assert(spark.sql("SELECT count(*) AS n FROM graft_history('lake.m') " +
      "WHERE operation = 'MERGE_INTO'").head().getLong(0) == 1L)
    assert(spark.sql("VACUUM lake.m FORCE").head().getInt(0) >= 0)
  }

  test("ALTER TABLE by name and by path: add columns, widen types, reject narrowing") {
    val root = register()
    spark.sql("CREATE TABLE lake.ev PARTITIONED BY (p) AS " +
      "SELECT cast(id AS int) AS k, 'a' AS p FROM range(3)")
    // Spark-native ALTER resolves through catalog.alterTable
    spark.sql("ALTER TABLE lake.ev ADD COLUMNS (note STRING, score DOUBLE)")
    spark.sql("ALTER TABLE lake.ev ALTER COLUMN k TYPE BIGINT")
    val schema = spark.table("lake.ev").schema
    assert(schema.fieldNames.toSeq == Seq("k", "p", "note", "score"))
    assert(schema("k").dataType == org.apache.spark.sql.types.LongType)
    // old rows NULL-fill; narrow files serve under the wider type
    assert(spark.sql("SELECT sum(k) AS s FROM lake.ev").as[Long].head() == 3L)
    assert(spark.table("lake.ev").filter(col("note").isNotNull).count() == 0L)
    // rejection: narrowing is not evolution
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lake.ev ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("widen"))
    // the path form goes through the dialect parser, same commit path
    val p = s"$root/ev"
    spark.sql(s"ALTER TABLE graft.`$p` ADD COLUMNS (extra INT)")
    assert(spark.table("lake.ev").schema.fieldNames.contains("extra"))
    // evolution commits are metadata-only: zero files added or removed
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$p`").collect()
      .filter(_.getString(1) == "ALTER_SCHEMA")
    assert(hist.nonEmpty)
    assert(hist.forall(r => r.getInt(3) == 0 && r.getInt(4) == 0))
  }

  test("empty CREATE TABLE, SHOW TABLES, DROP TABLE, namespaces") {
    register()
    spark.sql("CREATE NAMESPACE lake.ns1")
    spark.sql(
      "CREATE TABLE lake.ns1.t (k BIGINT, p STRING) PARTITIONED BY (p) " +
        "TBLPROPERTIES ('stats_by' = 'k')")
    // empty table: version 1, zero files, readable, then appendable
    assert(spark.table("lake.ns1.t").count() == 0L)
    spark.sql("INSERT INTO lake.ns1.t SELECT id, 'x' FROM range(7)")
    assert(spark.table("lake.ns1.t").count() == 7L)
    val tables = spark.sql("SHOW TABLES IN lake.ns1").collect()
      .map(_.getString(1))
    assert(tables.contains("t"))
    val nss = spark.sql("SHOW NAMESPACES IN lake").collect()
      .map(_.getString(0))
    assert(nss.contains("ns1"))
    spark.sql("DROP TABLE lake.ns1.t")
    assert(spark.sql("SHOW TABLES IN lake.ns1").isEmpty)
    // a foreign-catalog-looking name untouched by our dialect fails in
    // Spark's own resolution, not silently in ours
    intercept[Exception] { spark.sql("DESCRIBE HISTORY nosuch.db.t") }
  }

  test("RENAME COLUMN / DROP COLUMN / OPTIMIZE ZORDER by NAME through the catalog") {
    val root = register()
    spark.sql("CREATE TABLE lake.cm PARTITIONED BY (p) AS " +
      "SELECT id AS k, id * 2 AS a, id * 3 AS b, id * 5 AS c, " +
      "concat('p', cast(id % 2 AS string)) AS p FROM range(200)")
    // stats for the z-order dimensions (metadata-only evolution cannot
    // add stats cols, so recreate via the dialect's STATS BY instead)
    spark.sql(s"DROP TABLE lake.cm")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "12")
      spark.sql(s"CREATE TABLE graft.`$root/cm` PARTITIONED BY (p) " +
        "STATS BY (a, b, k) AS SELECT id AS k, id * 2 AS a, id * 3 AS b, " +
        "id * 5 AS c, concat('p', cast(id % 2 AS string)) AS p " +
        "FROM range(200)")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    val before = LogTable.snapshot(spark, s"$root/cm").files.map(_.name)
    spark.sql("ALTER TABLE lake.cm RENAME COLUMN a TO alpha"): Unit
    spark.sql("ALTER TABLE lake.cm DROP COLUMN c"): Unit
    val snap = LogTable.snapshot(spark, s"$root/cm")
    assert(snap.files.map(_.name).sorted == before.sorted,
      "named-catalog rename/drop must touch zero files")
    assert(spark.table("lake.cm").columns.toSeq ==
      Seq("k", "alpha", "b", "p"))
    assert(spark.sql("SELECT sum(alpha) AS s FROM lake.cm")
      .head().getLong(0) == (0L until 200L).map(_ * 2).sum)
    // 3-dimension OPTIMIZE ZORDER through SQL (alpha resolves through
    // the mapping to the at-rest stats name)
    spark.sql(s"OPTIMIZE graft.`$root/cm` MAX 1 FILES PER PARTITION " +
      "ZORDER BY (alpha, b, k)"): Unit
    assert(spark.table("lake.cm").count() == 200L)
    assert(LogTable.snapshot(spark, s"$root/cm").version > snap.version)
  }

  test("DROP TABLE / DROP NAMESPACE CASCADE refuse while live clones reference the target") {
    val root = register()
    spark.sql("CREATE NAMESPACE lake.dropns")
    spark.sql("CREATE TABLE lake.dropns.src PARTITIONED BY (p) AS " +
      "SELECT id AS k, concat('p', cast(id % 2 AS string)) AS p " +
      "FROM range(20)")
    // a clone OUTSIDE the namespace pins both the table and the subtree
    spark.sql(s"CREATE TABLE graft.`$root/ext_clone` SHALLOW CLONE " +
      "lake.dropns.src"): Unit
    val e1 = intercept[IllegalStateException](
      spark.sql("DROP TABLE lake.dropns.src"))
    assert(e1.getMessage.contains("ext_clone"))
    val e2 = intercept[IllegalArgumentException](
      spark.sql("DROP NAMESPACE lake.dropns CASCADE"))
    assert(e2.getMessage.contains("ext_clone"))
    // dropping the clone first releases its marker eagerly (no grace
    // wait) — both drops then succeed
    spark.sql("DROP TABLE lake.ext_clone")
    spark.sql("DROP TABLE lake.dropns.src")
    spark.sql("CREATE TABLE lake.dropns.src2 PARTITIONED BY (p) AS " +
      "SELECT id AS k, 'p0' AS p FROM range(5)")
    assert(spark.sql("DROP NAMESPACE lake.dropns CASCADE") != null)
    assert(!new java.io.File(s"$root/dropns").exists())
  }

  test("native CREATE TABLE with a years() transform maps to a generated column") {
    register()
    spark.sql("CREATE TABLE lake.gp (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (years(ts)) TBLPROPERTIES ('stats_by' = 'k')")
    val snap = LogTable.snapshot(spark,
      s"$catalogRoot/gp")
    assert(snap.partitionCols == Seq("ts_year"))
    assert(snap.properties.get("gen.ts_year").contains("year(ts)"))
    spark.sql("INSERT INTO lake.gp VALUES " +
      "(1, TIMESTAMP'2003-04-05 00:00:00'), " +
      "(2, TIMESTAMP'2007-08-09 00:00:00')")
    assert(spark.sql(
      "SELECT k FROM lake.gp WHERE ts_year = 2007").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // the derived column materialized even though INSERT never named it
    assert(spark.table("lake.gp").filter(col("ts_year").isNull).count() == 0)
  }

  test("native CREATE TABLE with hours() and bucket(N) transforms") {
    register()
    spark.sql("CREATE TABLE lake.hp (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts)) TBLPROPERTIES ('stats_by' = 'k')")
    val hs = LogTable.snapshot(spark, s"$catalogRoot/hp")
    assert(hs.partitionCols == Seq("ts_hour"))
    assert(hs.properties.get("gen.ts_hour")
      .contains("date_trunc('HOUR', ts)"))
    spark.sql("INSERT INTO lake.hp VALUES " +
      "(1, TIMESTAMP'2003-04-05 07:15:00'), " +
      "(2, TIMESTAMP'2003-04-05 09:45:00')")
    assert(spark.sql("SELECT k FROM lake.hp " +
      "WHERE ts >= TIMESTAMP'2003-04-05 09:00:00'").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    spark.sql("CREATE TABLE lake.bp (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(8, k))")
    val bs = LogTable.snapshot(spark, s"$catalogRoot/bp")
    assert(bs.partitionCols == Seq("k_bucket"))
    assert(bs.properties.get("gen.k_bucket").contains("pmod(hash(k), 8)"))
    spark.sql("INSERT INTO lake.bp SELECT id, id * 2 FROM range(64)")
    assert(spark.sql("SELECT v FROM lake.bp WHERE k = 11").collect()
      .map(_.getLong(0)).toSeq == Seq(22L))
  }

  test("writeTo/V2 exec paths are locked out; spark.table backstop substitutes") {
    register()
    spark.sql("CREATE TABLE lake.locked PARTITIONED BY (p) AS " +
      "SELECT id AS k, 'a' AS p FROM range(3)")
    // the relation from the catalog handle still reads through the rule
    assert(spark.table("lake.locked").count() == 3L)
    // DataFrame V2 writes must NOT write behind the commit log: the
    // capability-less table refuses them loud
    intercept[Exception] {
      Seq((9L, "a")).toDF("k", "p").writeTo("lake.locked").append()
    }
    assert(spark.table("lake.locked").count() == 3L, "no write leaked")
  }
}
