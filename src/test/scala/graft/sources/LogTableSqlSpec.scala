package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL front door (`graft.`<dir>``): reads must plan EXACTLY like the
  * programmatic API, and every DML statement must land on the same
  * transactional entry points (append/overwrite/delete/update/merge).
  * The shared test session enables `graft.expr.GraftExtensions`, so this
  * suite also covers the injection path itself.
  */
class LogTableSqlSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-sql").toString

  private def mkTable(n: Int = 40): String = {
    import spark.implicits._
    val path = tmp()
    val df = (1 to n).map(i =>
      (i.toLong, i % 4, s"v$i", i.toLong * 100, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")
    LogTable.create(spark, path, df, Seq("part"), Seq("k")): Unit
    path
  }

  private def sqlRef(path: String) = s"graft.`$path`"

  test("SELECT over graft.`path` matches the programmatic read") {
    val t = mkTable()
    val viaSql = spark.sql(s"SELECT k, cents FROM ${sqlRef(t)} WHERE part = 2")
    val viaApi = LogTable.read(spark, t).filter(col("part") === 2)
      .select("k", "cents")
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
    assert(viaSql.count() === 10)
  }

  test("graft tables join with ordinary relations in one statement") {
    val t = mkTable()
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("k", "tag").createOrReplaceTempView("tags")
    val got = spark.sql(
      s"SELECT g.k, tags.tag FROM ${sqlRef(t)} g JOIN tags ON g.k = tags.k ORDER BY g.k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "x"), (2L, "y")))
  }

  test("VERSION AS OF reads a pinned snapshot") {
    val t = mkTable(10)
    import spark.implicits._
    LogTable.append(spark, t, Seq((100L, 1, "new", 1L, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    assert(spark.sql(s"SELECT count(*) AS n FROM ${sqlRef(t)}")
      .head().getLong(0) === 11)
    assert(spark.sql(s"SELECT count(*) AS n FROM ${sqlRef(t)} VERSION AS OF 1")
      .head().getLong(0) === 10)
  }

  test("TIMESTAMP AS OF resolves through commit times") {
    val t = mkTable(10)
    import spark.implicits._
    Thread.sleep(1100) // commit-file mtimes are second-granular on some FS
    val cut = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    LogTable.append(spark, t, Seq((100L, 1, "new", 1L, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    assert(spark.sql(
      s"SELECT count(*) AS n FROM ${sqlRef(t)} TIMESTAMP AS OF '$cut'")
      .head().getLong(0) === 10)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM ${sqlRef(t)} TIMESTAMP AS OF '1990-01-01'").collect())
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("INSERT INTO appends through one commit; INSERT OVERWRITE replaces") {
    val t = mkTable(10)
    spark.sql(s"INSERT INTO ${sqlRef(t)} VALUES (41, 1, 'ins', 4100, 0, 'U')")
    assert(LogTable.read(spark, t).count() === 11)
    val h = LogTable.history(spark, t).filter(col("operation") === "APPEND")
    assert(h.count() === 1)
    // column-list form: unnamed nullable columns fill with NULL
    spark.sql(s"INSERT INTO ${sqlRef(t)} (k, part, cents, ver, op) " +
      "VALUES (42, 2, 4200, 0, 'U')")
    val r42 = LogTable.read(spark, t).filter(col("k") === 42).head()
    assert(r42.isNullAt(r42.fieldIndex("name")))
    spark.sql(s"INSERT OVERWRITE ${sqlRef(t)} " +
      s"SELECT * FROM ${sqlRef(t)} WHERE part = 0")
    assert(LogTable.read(spark, t).count() === 2) // k in {4, 8}
    assert(LogTable.history(spark, t)
      .filter(col("operation") === "OVERWRITE").count() === 1)
    // time travel still reaches the pre-overwrite state
    assert(spark.sql(s"SELECT count(*) AS n FROM ${sqlRef(t)} VERSION AS OF 3")
      .head().getLong(0) === 12)
  }

  test("positional INSERT with wrong arity fails loud") {
    val t = mkTable(4)
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO ${sqlRef(t)} VALUES (1, 2, 'x')"))
    assert(e.getMessage.contains("columns"))
  }

  test("DELETE FROM ... WHERE runs the stats-planned delete") {
    val t = mkTable()
    spark.sql(s"DELETE FROM ${sqlRef(t)} WHERE part = 1 AND cents < 2000")
    val want = LogTable.read(spark, t)
    assert(want.filter(col("part") === 1 && col("cents") < 2000).count() === 0)
    assert(want.count() === 40 - 5) // k in {1,5,9,13,17} killed
    assert(LogTable.history(spark, t)
      .filter(col("operation") === "DELETE").count() === 1)
  }

  test("UPDATE ... SET ... WHERE updates in one transaction") {
    val t = mkTable()
    spark.sql(s"UPDATE ${sqlRef(t)} SET cents = cents * 2, name = 'upd' " +
      "WHERE k % 10 = 0")
    val rows = LogTable.read(spark, t).filter(col("k") % 10 === 0)
    assert(rows.count() === 4)
    assert(rows.filter(col("name") === "upd").count() === 4)
    assert(rows.agg(sum("cents")).head().getLong(0) === (10 + 20 + 30 + 40) * 100 * 2)
  }

  test("MERGE INTO maps clauses onto the log-table merge") {
    val t = mkTable(10)
    import spark.implicits._
    // the pruned-merge contract: the source must carry key AND partition
    // columns (a key's partition value is fixed for life)
    Seq((2L, 2, 5000L, "U"), (3L, 3, 0L, "D"), (99L, 3, 9900L, "I"))
      .toDF("k", "part", "cents", "action").createOrReplaceTempView("changes")
    spark.sql(
      s"""MERGE INTO ${sqlRef(t)} t USING changes s ON t.k = s.k
         |WHEN MATCHED AND s.action = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET cents = s.cents, name = 'merged'
         |WHEN NOT MATCHED THEN INSERT (k, part, name, cents, ver, op)
         |  VALUES (s.k, s.part, 'inserted', s.cents, 0, 'U')
         |""".stripMargin)
    val now = LogTable.read(spark, t)
    assert(now.count() === 10) // 10 - 1 deleted + 1 inserted
    assert(now.filter(col("k") === 3).count() === 0)
    val r2 = now.filter(col("k") === 2).head()
    assert(r2.getLong(r2.fieldIndex("cents")) === 5000L &&
      r2.getString(r2.fieldIndex("name")) === "merged")
    val r99 = now.filter(col("k") === 99).head()
    assert(r99.getString(r99.fieldIndex("name")) === "inserted")
  }

  test("merge ON clause must be same-name key equalities") {
    val t = mkTable(4)
    import spark.implicits._
    Seq((1L, 1L)).toDF("k", "cents").createOrReplaceTempView("src1")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO ${sqlRef(t)} t USING src1 s ON t.k > s.k
         |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("key equalit"))
  }

  test("WHEN NOT MATCHED BY SOURCE maps onto the builder's by-source clauses") {
    val t = mkTable(6)
    import spark.implicits._
    // keep 2 and 4, reprice 2; everything else departs in ONE statement
    Seq((2L, 9999L), (4L, 400L)).toDF("k", "cents")
      .createOrReplaceTempView("src2")
    spark.sql(
      s"""MERGE INTO ${sqlRef(t)} t USING src2 s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET cents = s.cents, ver = t.ver + 1
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin): Unit
    val got = LogTable.read(spark, t).select("k", "cents")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((2L, 9999L), (4L, 400L)))
    // a by-source clause referencing the source scope is rejected loud
    val e = intercept[IllegalArgumentException](spark.sql(
      s"""MERGE INTO ${sqlRef(t)} t USING src2 s ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND s.cents > 0 THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("source scope"))
  }

  test("lifecycle statements: DESCRIBE HISTORY / OPTIMIZE / VACUUM / constraints") {
    val t = mkTable(40)
    import spark.implicits._
    // ALTER TABLE ADD CONSTRAINT persists and enforces
    val v = spark.sql(
      s"ALTER TABLE ${sqlRef(t)} ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
      .as[Long].head()
    assert(v == 2L)
    assert(LogTable.snapshot(spark, t).constraints ==
      Map("cents_pos" -> "cents >= 0"))
    val bad = intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO ${sqlRef(t)} VALUES (999, 1, 'bad', -5, 0, 'U')"))
    assert(bad.getMessage.contains("cents_pos"))
    // OPTIMIZE compacts under the persisted layout
    LogTable.append(spark, t, Seq((100L, 1, "x", 1L, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    val filesBefore = LogTable.snapshot(spark, t).files.length
    val ov = spark.sql(s"OPTIMIZE ${sqlRef(t)} MAX 1 FILES PER PARTITION")
      .as[Long].head()
    assert(ov > 0L)
    assert(LogTable.snapshot(spark, t).files.length <= filesBefore)
    assert(LogTable.read(spark, t).count() === 41)
    // DESCRIBE HISTORY lists every commit, newest first
    val hist = spark.sql(s"DESCRIBE HISTORY ${sqlRef(t)}")
      .select("version", "operation").as[(Long, String)].collect().toSeq
    assert(hist.head._1 == hist.map(_._1).max)
    assert(hist.map(_._2).contains("ADD CONSTRAINT"))
    assert(hist.map(_._2).contains("COMPACT"))
    // VACUUM under the floor fails loud; FORCE prunes the dead files
    intercept[IllegalArgumentException](
      spark.sql(s"VACUUM ${sqlRef(t)} RETAIN 0 HOURS"))
    val deleted = spark.sql(s"VACUUM ${sqlRef(t)} RETAIN 0 HOURS FORCE")
      .as[Int].head()
    assert(deleted > 0, "compaction leftovers must vacuum")
    assert(LogTable.read(spark, t).count() === 41)
    // DROP CONSTRAINT
    spark.sql(s"ALTER TABLE ${sqlRef(t)} DROP CONSTRAINT cents_pos"): Unit
    assert(LogTable.snapshot(spark, t).constraints.isEmpty)
    // the delegating parser leaves ordinary SQL alone
    assert(spark.sql("SELECT 1 AS one").as[Int].head() == 1)
  }

  test("graft_changes / graft_net_changes TVFs surface the feeds in SQL") {
    val t = mkTable(10) // v1
    import spark.implicits._
    spark.sql(s"UPDATE ${sqlRef(t)} SET cents = cents + 5 WHERE k <= 2"): Unit
    // file-level CDF: reconstruction identity rows (riders included)
    val ch = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM graft_changes('$t', 1, 2) " +
        "GROUP BY 1").as[(String, Long)].collect().toMap
    assert(ch("insert") == ch("delete") && ch("insert") >= 2,
      s"CDF must re-emit the rewritten files' rows: $ch")
    // row-level net changes: riders cancel, only k=1,2 remain as updates
    val net = spark.sql(
      s"SELECT k, _change_type FROM graft_net_changes('$t', 1, 2, 'k')")
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(net == Seq(
      (1L, "update_postimage"), (1L, "update_preimage"),
      (2L, "update_postimage"), (2L, "update_preimage")), net)
    // composes with SQL on top (filters, aggregates, joins)
    assert(spark.sql(s"SELECT sum(cents) FROM graft_net_changes('$t', 1, 2, " +
      "'k') WHERE _change_type = 'update_postimage'")
      .as[Long].head() == (100L + 5) + (200L + 5))
    // non-literal bounds fail loud — versions pick COMMITS at plan time
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$t', 1, 1 + 1)").collect())
    assert(e.getMessage.contains("version or timestamp literal"),
      e.getMessage)
  }

  test("OPTIMIZE ... ZORDER BY re-clusters through SQL") {
    import spark.implicits._
    val path = tmp()
    val df = (1 to 80).map(i =>
      (i.toLong, i % 4, s"v$i", i.toLong * 100, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")
    LogTable.create(spark, path, df, Seq("part"), Seq("k", "cents")): Unit
    // a second wave fragments every partition value past the budget
    LogTable.append(spark, path, (81 to 120).map(i =>
      (i.toLong, i % 4, s"v$i", i.toLong * 100, 0L, "U"))
      .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    val ref = s"graft.`$path`"
    val v = spark.sql(s"OPTIMIZE $ref MAX 1 FILES PER PARTITION " +
      "ZORDER BY (k, cents)").as[Long].head()
    assert(v > 0L)
    assert(LogTable.read(spark, path).count() === 120)
    // an undeclared z-order column fails loud, transactionally nothing
    val e = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE $ref MAX 1 FILES PER PARTITION ZORDER BY (ver, cents)"))
    assert(e.getMessage.contains("stats-declared"))
  }

  test("RESTORE by timestamp, CHECKPOINT [EXPIRE], and the graft_files TVF") {
    import spark.implicits._
    val t = mkTable(30)
    val beforeDelete = System.currentTimeMillis()
    Thread.sleep(5L)
    LogTable.deleteWhere(spark, t, org.apache.spark.sql.functions
      .col("k") <= 20L): Unit
    // the file inventory is metadata-only and names every live file
    val files = spark.sql(s"SELECT * FROM graft_files('$t')").collect()
    assert(files.nonEmpty)
    assert(files.map(_.getAs[Long]("rows")).sum >= 10L)
    // time-travel the inventory to the pre-delete version
    assert(spark.sql(s"SELECT sum(rows) AS r FROM graft_files('$t', 1)")
      .as[Long].head() == 30L)
    // restore to the wall-clock moment before the delete
    val ts = new java.sql.Timestamp(beforeDelete).toString
    val v = spark.sql(
      s"RESTORE TABLE ${sqlRef(t)} TO TIMESTAMP AS OF '$ts'")
      .head().getLong(0)
    assert(v == 3L)
    assert(LogTable.read(spark, t).count() == 30L)
    // checkpoint + expire collapses replay to one file and drops the
    // now-redundant commits; the table still reads whole
    val r = spark.sql(s"CHECKPOINT ${sqlRef(t)} EXPIRE").head()
    assert(r.getLong(0) == 3L && r.getInt(1) >= 3)
    assert(LogTable.read(spark, t).count() == 30L)
    intercept[IllegalArgumentException] {
      LogTable.snapshot(spark, t, Some(1L)) // expired behind the checkpoint
    }
  }

  test("SET TBLPROPERTIES drives auto-checkpointing; reserved keys refuse") {
    import spark.implicits._
    val t = mkTable(20)
    spark.sql(s"ALTER TABLE ${sqlRef(t)} SET TBLPROPERTIES " +
      "('checkpoint.every' = '3', 'team' = 'ingest')"): Unit
    assert(LogTable.snapshot(spark, t).properties ==
      Map("checkpoint.every" -> "3", "team" -> "ingest"))
    // versions: 1 create, 2 set-props; the next commit is v3 → the
    // writer itself lands a checkpoint, no maintenance job involved
    LogTable.append(spark, t,
      Seq((100L, 0, "x", 1L, 0L, "U"))
        .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    assert(new java.io.File(t, f"_graft_log/${3L}%020d.checkpoint.json")
      .exists(), "the 3rd version must auto-checkpoint")
    // v4 does not checkpoint; v6 does
    LogTable.deleteWhere(spark, t, col("k") === 100L): Unit
    assert(!new java.io.File(t, f"_graft_log/${4L}%020d.checkpoint.json")
      .exists())
    // UNSET stops the policy
    spark.sql(s"ALTER TABLE ${sqlRef(t)} UNSET TBLPROPERTIES " +
      "('checkpoint.every')"): Unit
    LogTable.append(spark, t,
      Seq((101L, 0, "y", 1L, 0L, "U"))
        .toDF("k", "part", "name", "cents", "ver", "op")): Unit
    assert(!new java.io.File(t, f"_graft_log/${6L}%020d.checkpoint.json")
      .exists(), "unset must stop the auto-checkpoint")
    assert(LogTable.read(spark, t).count() == 21L)
    // engine-owned keys are not writable through property DDL
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE ${sqlRef(t)} SET TBLPROPERTIES " +
        "('gen.sneaky' = 'year(k)')")
    }
    assert(e.getMessage.contains("engine-owned"))
  }

  test("DESCRIBE DETAIL summarizes the snapshot without a data scan") {
    val t = mkTable(10)
    import spark.implicits._
    LogTable.addConstraint(spark, t, "cents_pos", "cents >= 0"): Unit
    LogTable.deleteWhere(spark, t, col("k") === 1L,
      deletionVectors = true): Unit
    val d = spark.sql(s"DESCRIBE DETAIL ${sqlRef(t)}").head()
    assert(d.getLong(d.fieldIndex("version")) == 3L)
    assert(d.getString(d.fieldIndex("partition_columns")) == "part")
    assert(d.getString(d.fieldIndex("stats_columns")) == "k")
    assert(d.getLong(d.fieldIndex("num_rows")) == 9L) // DV-net live rows
    assert(d.getLong(d.fieldIndex("deleted_rows_in_vectors")) == 1L)
    assert(d.getString(d.fieldIndex("constraints"))
      .contains("cents_pos: cents >= 0"))
  }

  test("CREATE TABLE ... AS SELECT builds a real log table through SQL") {
    import spark.implicits._
    val src = mkTable(20)
    val t = tmp() + "/ctas"
    val v = spark.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (part) " +
      s"STATS BY (k, cents) AS SELECT * FROM ${sqlRef(src)} WHERE k <= 12")
      .as[Long].head()
    assert(v == 1L)
    val snap = LogTable.snapshot(spark, t)
    assert(snap.partitionCols == Seq("part"))
    assert(snap.statsCols == Seq("k", "cents"))
    assert(LogTable.read(spark, t).count() === 12)
    // the created table takes DML + lifecycle statements immediately
    spark.sql(s"DELETE FROM graft.`$t` WHERE k = 1"): Unit
    assert(LogTable.read(spark, t).count() === 11)
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$t`").count() === 2)
    // z-order clause persists the layout (stats declaration enforced)
    val tz = tmp() + "/ctaz"
    spark.sql(s"CREATE TABLE graft.`$tz` PARTITIONED BY (part) " +
      s"STATS BY (k, cents) ZORDER BY (k, cents) " +
      s"AS SELECT * FROM ${sqlRef(src)}"): Unit
    assert(LogTable.read(spark, tz).count() === 20)
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE graft.`${tmp()}/bad` PARTITIONED BY (part) " +
        s"ZORDER BY (k, cents) AS SELECT * FROM ${sqlRef(src)}"))
  }

  test("CREATE/REFRESH MATERIALIZED VIEW + graft_mv run the IVM through SQL") {
    val base = mkTable(40)
    val mv = tmp() + "/mv"
    import spark.implicits._
    val v = spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` BUCKETS 8 AS " +
      s"SELECT part, count(*) AS n, sum(cents) AS sum_cents, " +
      s"min(cents) AS min_cents, max(cents) AS max_cents " +
      s"FROM ${sqlRef(base)} GROUP BY part").as[Long].head()
    assert(v > 0L)
    def want = LogTable.read(spark, base).groupBy("part")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
    def got = spark.sql(s"SELECT * FROM graft_mv('$mv')")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // base DML through SQL, refresh through SQL — deleting the current
    // minima exercises the rescan from the statement path too
    spark.sql(s"DELETE FROM ${sqlRef(base)} WHERE cents <= 200"): Unit
    assert(spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$mv`")
      .as[Long].head() > 0L)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$mv`")
      .as[Long].head() == -1L)
    // non-maintainable shapes are rejected loud
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE MATERIALIZED VIEW graft.`${tmp()}/m2` AS SELECT part, " +
        s"count(*) AS n FROM ${sqlRef(base)} WHERE part = 1 GROUP BY part"))
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE MATERIALIZED VIEW graft.`${tmp()}/m3` AS SELECT part, " +
        s"sum(cents + 1) AS s FROM ${sqlRef(base)} GROUP BY part"))
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE MATERIALIZED VIEW graft.`${tmp()}/m4` AS SELECT part, " +
        s"count(DISTINCT cents) AS s FROM ${sqlRef(base)} GROUP BY part"))
  }

  test("non-graft relations are untouched by the rule") {
    import spark.implicits._
    Seq((1, "a")).toDF("x", "y").createOrReplaceTempView("plain")
    assert(spark.sql("SELECT * FROM plain").count() === 1)
    intercept[AnalysisException](spark.sql("SELECT * FROM graftish.`/nope`"))
  }

  test("append is strict about schema; overwrite survives constraints") {
    val t = mkTable(4)
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      LogTable.append(spark, t,
        Seq((1L, 1)).toDF("k", "part"))) // missing columns
    assert(e.getMessage.contains("missing column"))
    LogTable.addConstraint(spark, t, "cents_pos", "cents >= 0"): Unit
    val bad = intercept[IllegalArgumentException](spark.sql(
      s"INSERT INTO ${sqlRef(t)} VALUES (50, 1, 'bad', -1, 0, 'U')"))
    assert(bad.getMessage.contains("cents_pos"))
    // constraint also survives an overwrite
    spark.sql(s"INSERT OVERWRITE ${sqlRef(t)} " +
      s"SELECT * FROM ${sqlRef(t)} WHERE part <> 1")
    assert(LogTable.snapshot(spark, t).constraints.contains("cents_pos"))
  }
}
