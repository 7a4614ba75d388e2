package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ROW TRACKING (`rowtracking.enabled`): every row carries a stable
  * BIGINT `_row_id`, dense-assigned at first write and preserved through
  * every rewrite — the Delta row-tracking shape. The latest-wins upsert
  * and MERGE INTO inherit matched keys' ids and assign fresh ones to new
  * keys, so `readNetChanges` folds KEYLESS on tables without a natural
  * key.
  */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-rowtrack").toString

  private def idsByKey(t: String): Map[Long, Long] =
    LogTable.read(spark, t).select("k", "_row_id").as[(Long, Long)]
      .collect().toMap

  test("ids assign dense at create, stay unique through append, and " +
    "SURVIVE update, delete and compaction unchanged") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 20L).map(i => (i, s"p${i % 2}", i * 10L))
        .toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.RowTrackingProp -> "true"))
    val ids0 = idsByKey(t)
    assert(ids0.values.toSeq.sorted == (0L until 20L).toSeq,
      s"dense 0..19 expected, got ${ids0.values.toSeq.sorted}")
    // appends continue above the water
    LogTable.append(spark, t,
      Seq((21L, "p1", 210L), (22L, "p0", 220L)).toDF("k", "p", "cents")): Unit
    val ids1 = idsByKey(t)
    assert(ids1(21L) >= 20L && ids1(22L) >= 20L && ids1(21L) != ids1(22L))
    assert(ids1.filter(_._1 <= 20L) == ids0, "appends never touch old ids")
    // UPDATE rewrites files but never re-keys rows
    LogTable.updateWhere(spark, t, col("k") % 3 === 0,
      Map("cents" -> (col("cents") + 1L))): Unit
    assert(idsByKey(t) == ids1, "update must preserve every _row_id")
    // DELETE: survivors keep theirs
    LogTable.deleteWhere(spark, t, col("k") === 5L): Unit
    assert(idsByKey(t) == ids1 - 5L, "delete survivors keep their ids")
    // COMPACTION: pure re-arrangement, ids bit-identical
    LogTable.compactPartitions(spark, t, maxFilesPerPartition = 1): Unit
    assert(idsByKey(t) == ids1 - 5L, "compaction must preserve ids")
  }

  test("upsert inherits matched keys' ids and mints fresh ones for new " +
    "keys; MERGE INTO does the same through its insert clause") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      Seq((1L, "p0", "a", 0L, "U"), (2L, "p0", "b", 0L, "U"))
        .toDF("k", "p", "v", "ver", "op"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.RowTrackingProp -> "true"))
    val ids0 = idsByKey(t)
    LogTable.upsert(spark, t,
      Seq((2L, "p0", "b2", 1L, "U"), (3L, "p1", "c", 1L, "U"))
        .toDF("k", "p", "v", "ver", "op"),
      Seq("k"), Seq("ver"), "op"): Unit
    val ids1 = idsByKey(t)
    assert(ids1(1L) == ids0(1L) && ids1(2L) == ids0(2L),
      s"matched keys keep their row ids: $ids0 -> $ids1")
    assert(ids1(3L) > ids0.values.max, "new keys mint fresh ids")
    LogTable.mergeInto(spark, t,
      Seq((1L, "p0", "a2", 9L, "U"), (4L, "p1", "d", 9L, "U"))
        .toDF("k", "p", "v", "ver", "op"), Seq("k"))
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert().run(): Unit
    val ids2 = idsByKey(t)
    assert(ids2(1L) == ids0(1L), "merge update keeps the id")
    assert(ids2(4L) > ids1.values.max, "merge insert mints fresh")
    assert(ids2.values.toSeq.distinct.size == 4, s"unique: $ids2")
  }

  test("readNetChanges folds KEYLESS on _row_id; guards refuse rename/" +
    "drop/raw-property writes; convert refuses adoption-time enabling") {
    val t = tmp() + "/t"
    LogTable.create(spark, t,
      (1L to 10L).map(i => (i, "p0", i * 10L)).toDF("k", "p", "cents"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.RowTrackingProp -> "true"))
    val v1 = 1L
    LogTable.updateWhere(spark, t, col("k") === 3L,
      Map("cents" -> lit(999L))): Unit
    LogTable.deleteWhere(spark, t, col("k") === 7L): Unit
    LogTable.append(spark, t, Seq((11L, "p0", 110L))
      .toDF("k", "p", "cents")): Unit
    val head = LogTable.latestVersion(spark, t)
    // keyless fold: reconstruct head from v1 + net changes BY _row_id
    val net = LogTable.readNetChanges(spark, t, v1, head, Nil)
    val pre = LogTable.read(spark, t, asOf = Some(v1))
      .select("_row_id", "k", "cents")
    val deletes = net.filter(col("_change_type").isin(
      "delete", "update_preimage")).select("_row_id")
    val inserts = net.filter(col("_change_type").isin(
      "insert", "update_postimage")).select("_row_id", "k", "cents")
    val rebuilt = pre.join(deletes, Seq("_row_id"), "left_anti")
      .unionByName(inserts)
    val now = LogTable.read(spark, t).select("_row_id", "k", "cents")
    assert(rebuilt.exceptAll(now).count() == 0 &&
      now.exceptAll(rebuilt).count() == 0,
      "keyless net-change fold must reconstruct the head state")
    // a non-tracking table still demands keys
    val t2 = tmp() + "/t2"
    LogTable.create(spark, t2, Seq((1L, "p0")).toDF("k", "p"), Seq("p"))
    LogTable.append(spark, t2, Seq((2L, "p0")).toDF("k", "p")): Unit
    val e0 = intercept[IllegalArgumentException] {
      LogTable.readNetChanges(spark, t2, 1L, 2L, Nil)
    }
    assert(e0.getMessage.contains("rowtracking"), e0.getMessage)
    // guards
    import org.apache.spark.sql.connector.catalog.TableChange
    val e1 = intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, t, Seq(
        TableChange.renameColumn(Array("_row_id"), "rid"))): Unit
    }
    assert(e1.getMessage.contains("row-tracking"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      LogTable.evolveSchema(spark, t, Seq(
        TableChange.deleteColumn(Array("_row_id"), false))): Unit
    }
    assert(e2.getMessage.contains("row-tracking"), e2.getMessage)
    intercept[IllegalArgumentException] {
      LogTable.setProperties(spark, t,
        Map(LogTable.RowTrackingNextProp -> "1")): Unit
    }
    val raw = tmp() + "/raw"
    Seq((1L, "a")).toDF("k", "v").write.parquet(raw)
    val e3 = intercept[IllegalArgumentException] {
      LogTable.convert(spark, raw,
        tableProperties = Map(LogTable.RowTrackingProp -> "true"))
    }
    assert(e3.getMessage.contains("rowtracking"), e3.getMessage)
  }
}
