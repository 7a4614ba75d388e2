package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `optimize.every` — orchestrator-free small-file maintenance: after
  * every n-th data-change commit the writer runs the debt-triggered
  * compaction (budget `optimize.maxfiles`), post-publish best-effort,
  * metadata-only when every partition value is under budget. The
  * compaction commit is dataChange=false, so the policy never re-fires
  * off its own write.
  */
class AutoOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-autoopt").toString

  private def filesPerValue(t: String): Map[String, Int] = {
    val snap = LogTable.snapshot(spark, t)
    snap.files.flatMap(f => Set(f.pmin, f.pmax))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("ingest loops stay under the file budget without any manual " +
    "OPTIMIZE; content is preserved; the policy never self-fires") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((0L, "p0", 0L)).toDF("k", "p", "v"), Seq("p"),
      statsCols = Seq("k"),
      tableProperties = Map(
        LogTable.OptimizeEveryProp -> "2",
        LogTable.OptimizeMaxFilesProp -> "3"))
    // 8 appends to the SAME partition: unmaintained this accretes 8+
    // files in p0; the policy fires on every 2nd commit and folds them
    (1L to 8L).foreach { i =>
      LogTable.append(spark, t,
        Seq((i, "p0", i)).toDF("k", "p", "v")): Unit
    }
    val perValue = filesPerValue(t)
    assert(perValue("p0") <= 4, // budget 3 (+1 for the last uncompacted)
      s"auto-optimize must bound partition debt, got $perValue")
    // content identical to what the appends wrote
    assert(LogTable.read(spark, t).agg(sum("v")).as[Long].head() ==
      (1L to 8L).sum)
    assert(LogTable.read(spark, t).count() == 9L)
    // COMPACT commits appear in history, all dataChange=false (the
    // policy fired off data changes only — never off itself)
    val h = LogTable.history(spark, t)
      .select("version", "operation", "data_change").collect()
    val compacts = h.filter(_.getString(1) == "COMPACT")
    assert(compacts.nonEmpty, "the policy must have fired")
    assert(compacts.forall(!_.getBoolean(2)))
    // a metadata-only commit (property set) does not fire the policy
    val vPre = LogTable.latestVersion(spark, t)
    LogTable.setProperties(spark, t, Map("note" -> "x")): Unit
    assert(LogTable.latestVersion(spark, t) == vPre + 1,
      "a non-data commit must not trigger a compaction commit")
  }
}
