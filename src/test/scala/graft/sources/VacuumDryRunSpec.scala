package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `VACUUM ... DRY RUN`: the preview enumerates EXACTLY what the real
  * pass would reclaim — same retention guard, same clone protection —
  * and deletes nothing. The read an operator does before an
  * irreversible sweep.
  */
class VacuumDryRunSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-vdr").toString

  test("preview lists the real pass's exact reclaim set and touches " +
    "nothing; the retention floor still guards it") {
    val t = tmp()
    LogTable.create(spark, t,
      (0L until 20L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"))
    // orphan history: rewrite half the table, then overwrite everything
    LogTable.deleteWhere(spark, t, col("k") % 2 === 0): Unit
    LogTable.overwriteAll(spark, t,
      (0L until 5L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v")): Unit
    Thread.sleep(5L)
    // floor guard applies to the preview too
    intercept[IllegalArgumentException] {
      LogTable.vacuumPreview(spark, t, 0L): Unit
    }
    val preview = spark.sql(s"VACUUM graft.`$t` RETAIN 0 HOURS FORCE DRY RUN")
      .select("would_delete").collect().map(_.getString(0)).toSet
    assert(preview.nonEmpty, "history rewrites must leave reclaimable files")
    // nothing deleted: every previewed path still exists
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(preview.forall(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p))), "DRY RUN must not delete")
    assert(LogTable.read(spark, t).count() == 5L)
    // the real pass reclaims exactly the previewed set
    val deleted = LogTable.vacuum(spark, t, 0L, force = true)
    assert(deleted == preview.size,
      s"real vacuum deleted $deleted, preview said ${preview.size}")
    assert(preview.forall(p =>
      !fs.exists(new org.apache.hadoop.fs.Path(p))))
    assert(LogTable.read(spark, t).count() == 5L)
  }

  test("DESCRIBE DETAIL surfaces the in-commit time and ndv estimates") {
    val t = tmp()
    LogTable.create(spark, t,
      (0L until 10L).map(i => (i, s"p${i % 2}", i)).toDF("k", "p", "v"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map("ndv.cols" -> "k"))
    val row = spark.sql(s"DESCRIBE DETAIL graft.`$t`").head()
    assert(row.getAs[java.sql.Timestamp]("commit_time") != null)
    assert(row.getAs[String]("distinct_counts") == "k=10")
  }
}
