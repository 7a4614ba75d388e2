package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC / merge semantics: latest-wins upsert, tombstone handling,
  * out-of-order replay convergence, SCD2 change compression, and the
  * partition-pruned persisted merge (only touched directories rewritten;
  * rerun of the same batch converges).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-merge").toString

  test("upsert keeps the largest order key per key and inserts new keys") {
    val base = Seq((1L, "a", 0), (2L, "b", 0)).toDF("k", "v", "ver")
    val changes = Seq((2L, "b2", 1), (3L, "c", 1)).toDF("k", "v", "ver")
    val out = Merge.upsert(base, changes, Seq("k"), Seq("ver"))
      .orderBy("k").collect().toSeq
    assert(out == Seq(Row(1L, "a", 0), Row(2L, "b2", 1), Row(3L, "c", 1)))
  }

  test("upsert breaks order ties by the full order tuple") {
    val base = Seq((1L, "old", 0, 0)).toDF("k", "v", "ver", "pri")
    // same version, higher priority second column wins
    val changes = Seq((1L, "lo", 1, 0), (1L, "hi", 1, 5)).toDF("k", "v", "ver", "pri")
    val out = Merge.upsert(base, changes, Seq("k"), Seq("ver", "pri")).collect()
    assert(out.toSeq == Seq(Row(1L, "hi", 1, 5)))
  }

  test("merge drops a key whose latest change is a tombstone") {
    val base = Seq((1L, "a", 0), (2L, "b", 0)).toDF("k", "v", "ver")
    val changes = Seq((1L, "a", 1, "D"), (2L, "b2", 1, "U"))
      .toDF("k", "v", "ver", "op")
    val out = Merge.merge(base, changes, Seq("k"), Seq("ver"), "op")
      .select("k", "v", "ver").orderBy("k").collect().toSeq
    assert(out == Seq(Row(2L, "b2", 1)))
  }

  test("merge: a tombstone older than the latest upsert loses (out-of-order replay)") {
    val base = Seq((1L, "a", 0)).toDF("k", "v", "ver")
    // delete at ver 1 arrives in the same batch as a newer upsert at ver 2
    val changes = Seq((1L, "a", 1, "D"), (1L, "a2", 2, "U"))
      .toDF("k", "v", "ver", "op")
    val out = Merge.merge(base, changes, Seq("k"), Seq("ver"), "op")
      .select("k", "v", "ver").collect().toSeq
    assert(out == Seq(Row(1L, "a2", 2)))
  }

  test("merge is idempotent: re-applying the same changes reproduces the state") {
    val base = Seq((1L, "a", 0, "U"), (2L, "b", 0, "U")).toDF("k", "v", "ver", "op")
    val changes = Seq((1L, "a1", 1, "U"), (2L, "b", 1, "D"), (3L, "c", 1, "U"))
      .toDF("k", "v", "ver", "op")
    val once = Merge.merge(base, changes, Seq("k"), Seq("ver"), "op")
    val twice = Merge.merge(once, changes, Seq("k"), Seq("ver"), "op")
    assert(twice.orderBy("k").collect().toSeq ==
      once.orderBy("k").collect().toSeq)
  }

  test("scd2 compresses unchanged rows and closes intervals at the next change") {
    val feed = Seq(
      (1L, 10L, "x"), (1L, 20L, "x"), (1L, 30L, "y"), (1L, 40L, "x"),
      (2L, 15L, "z"))
      .toDF("k", "t", "attr")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Merge.scd2(feed, Seq("k"), "ts", Seq("attr"))
      .select(col("k"), col("attr"),
        unix_micros(col("valid_from")).as("from_us"),
        unix_micros(col("valid_to")).as("to_us"), col("is_current"))
      .orderBy("k", "from_us").collect().toSeq
    assert(out == Seq(
      // (1,20,"x") opens no interval; the x interval closes at the y change
      Row(1L, "x", 10L, 30L, false),
      Row(1L, "y", 30L, 40L, false),
      Row(1L, "x", 40L, null, true),
      Row(2L, "z", 15L, null, true)))
  }

  test("upsertPartitioned rewrites only touched partitions and converges on rerun") {
    val dir = tmp() + "/t"
    val base = Seq(
      (1L, "a", 0, "p1"), (2L, "b", 0, "p1"),
      (3L, "c", 0, "p2"), (4L, "d", 0, "p3"))
      .toDF("k", "v", "ver", "p")
    Sources.writeParquet(base, dir, partitionBy = Seq("p"))
    def filesIn(part: String): Set[String] = {
      val d = new java.io.File(dir, s"p=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.lastModified()).toSet
    }
    val p3Before = filesIn("p3")
    // changes touch p1 (update + tombstone) and p2 (insert); p3 untouched
    val changes = Seq(
      (1L, "a1", 1, "p1", "U"), (2L, "b", 1, "p1", "D"),
      (5L, "e", 1, "p2", "U"))
      .toDF("k", "v", "ver", "p", "op")
    val stats = Merge.upsertPartitioned(spark, dir, changes,
      Seq("k"), Seq("ver"), "p", "op")
    assert(stats.partitionsTouched == 2)
    // untouched partition's files are bit-identical on disk (same names,
    // same mtimes — dynamic overwrite never listed that directory)
    assert(filesIn("p3") == p3Before)
    val state = spark.read.parquet(dir)
      .select("k", "v", "ver", "p").orderBy("k").collect().toSeq
    assert(state == Seq(
      Row(1L, "a1", 1, "p1"), Row(3L, "c", 0, "p2"),
      Row(4L, "d", 0, "p3"), Row(5L, "e", 1, "p2")))
    // rerun of the same batch (the torn-publish recovery move) converges
    val stats2 = Merge.upsertPartitioned(spark, dir, changes,
      Seq("k"), Seq("ver"), "p", "op")
    assert(stats2.partitionsTouched == 2)
    assert(spark.read.parquet(dir)
      .select("k", "v", "ver", "p").orderBy("k").collect().toSeq == state)
  }

  test("upsertPartitioned deletes a partition the tombstones emptied") {
    val dir = tmp() + "/t"
    val base = Seq((1L, "a", 0, "p1"), (2L, "b", 0, "p2")).toDF("k", "v", "ver", "p")
    Sources.writeParquet(base, dir, partitionBy = Seq("p"))
    // every p1 row is tombstoned: dynamic overwrite alone would leave the
    // stale p1 directory in place; the emptied-partition sweep must drop it
    val changes = Seq((1L, "a", 1, "p1", "D")).toDF("k", "v", "ver", "p", "op")
    Merge.upsertPartitioned(spark, dir, changes, Seq("k"), Seq("ver"), "p", "op")
    assert(!new java.io.File(dir, "p=p1").exists())
    assert(spark.read.parquet(dir).select("k").collect().toSeq == Seq(Row(2L)))
  }

  test("scd2Apply ≡ batch scd2 over untouched, compressed, changed, and new keys") {
    def feedOf(rows: Seq[(Long, Long, String)]) = rows.toDF("k", "t", "attr")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    // old feed: k=1 stable 'x', k=2 ends open on 'b', k=3 untouched later
    val oldFeed = feedOf(Seq(
      (1L, 10L, "x"), (2L, 10L, "a"), (2L, 20L, "b"), (3L, 10L, "q")))
    // batch: k=1 repeats 'x' (boundary compression, no new interval),
    // k=2 changes (closes the open row), k=4 is brand new; k=3 absent
    val batch = feedOf(Seq((1L, 30L, "x"), (2L, 30L, "c"), (4L, 30L, "n")))
    val keys = Seq("k")
    val incremental = Merge.scd2Apply(
      Merge.scd2(oldFeed, keys, "ts", Seq("attr")), batch, keys, "ts", Seq("attr"))
    val batchBuild = Merge.scd2(oldFeed.unionByName(batch), keys, "ts", Seq("attr"))
    val proj = Seq("k", "attr", "valid_from", "valid_to", "is_current")
    assert(incremental.select(proj.map(col): _*).orderBy("k", "valid_from")
      .collect().toSeq ==
      batchBuild.select(proj.map(col): _*).orderBy("k", "valid_from")
        .collect().toSeq)
  }

  test("scd2Apply splits the history with broadcast joins on the batch keys") {
    val hist = Merge.scd2(
      Seq((1L, 10L, "x"), (2L, 10L, "y")).toDF("k", "t", "attr")
        .withColumn("ts", timestamp_micros(col("t"))).drop("t"),
      Seq("k"), "ts", Seq("attr"))
    val batch = Seq((2L, 20L, "z")).toDF("k", "t", "attr")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = Merge.scd2Apply(hist, batch, Seq("k"), "ts", Seq("attr"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the untouched/affected split must be broadcast (anti + semi), never
    // a shuffled join of the full history against a daily batch's keys
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("the merge base scan prunes to the touched partitions") {
    // pins the expression shape upsertPartitioned builds its base read
    // from: an isin() on the partition column lands as PartitionFilters,
    // so the untouched 99.9% of a 100 TB table is never READ (the
    // rewrite-side guarantee is the files_in assertion above)
    val dir = tmp() + "/t"
    val base = Seq((1L, 0, "p1"), (2L, 0, "p2"), (3L, 0, "p3"))
      .toDF("k", "ver", "p")
    Sources.writeParquet(base, dir, partitionBy = Seq("p"))
    val pruned = spark.read.parquet(dir)
      .filter(col("p").isin(Seq("p1", "p2"): _*))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("PartitionFilters: []"),
      plan)
  }

  test("upsertPartitioned reclaims crashed-run stages, spares live same-app ones") {
    val dir = tmp() + "/t"
    val base = Seq((1L, "a", 0, "p1")).toDF("k", "v", "ver", "p")
    Sources.writeParquet(base, dir, partitionBy = Seq("p"))
    // crashed-run stages: legacy fixed-name layout + a foreign app's
    // token — both aged past StaleStageMs (the sweep only reclaims
    // PROVABLY stale foreign dirs; a fresh one could be a live run)
    for (stale <- Seq(dir + "__stage", dir + "__stage_app-crashed_deadbeef")) {
      new java.io.File(stale, "p=p1").mkdirs()
      java.nio.file.Files.write(new java.io.File(stale, "leftover").toPath,
        Array[Byte](1, 2, 3))
      assert(new java.io.File(stale).setLastModified(
        System.currentTimeMillis() - Merge.StaleStageMs - 3600000L))
    }
    // a FRESH foreign-app stage = possibly a concurrently running second
    // application mid-merge; the age guard must spare it
    val freshForeign = new java.io.File(dir + "__stage_app-running_cafe0001")
    new java.io.File(freshForeign, "p=p8").mkdirs()
    // a stage owned by THIS application = possibly a live concurrent
    // merge; the sweep must not touch it at any age
    val live = new java.io.File(
      dir + "__stage_" + spark.sparkContext.applicationId + "_zzzzzzzz")
    new java.io.File(live, "p=p9").mkdirs()
    val changes = Seq((1L, "a1", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    Merge.upsertPartitioned(spark, dir, changes, Seq("k"), Seq("ver"), "p", "op")
    assert(!new java.io.File(dir + "__stage").exists())
    assert(!new java.io.File(dir + "__stage_app-crashed_deadbeef").exists())
    assert(freshForeign.exists(), "fresh foreign stage must out-wait the age guard")
    assert(live.exists(), "live same-app stage must survive the sweep")
    assert(spark.read.parquet(dir).select("k", "v", "ver").collect().toSeq ==
      Seq(Row(1L, "a1", 1)))
    // this run's own stage is gone after publish: nothing stage-shaped
    // remains beyond the planted survivors
    val left = new java.io.File(dir).getParentFile.listFiles()
      .map(_.getName).filter(_.startsWith("t__stage")).toSet
    assert(left == Set(live.getName, freshForeign.getName), left)
  }

  test("two concurrent-style merges of disjoint batches both land (unique stages)") {
    val dir = tmp() + "/t"
    val base = Seq((1L, "a", 0, "p1"), (2L, "b", 0, "p2")).toDF("k", "v", "ver", "p")
    Sources.writeParquet(base, dir, partitionBy = Seq("p"))
    // same app, interleaved in time: each run stages under its own token,
    // so neither clobbers the other's staged rows (the pre-fix layout
    // shared one fixed dir and could publish a mix)
    val c1 = Seq((1L, "a1", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    val c2 = Seq((2L, "b1", 1, "p2", "U")).toDF("k", "v", "ver", "p", "op")
    val t1 = new Thread(() =>
      Merge.upsertPartitioned(spark, dir, c1, Seq("k"), Seq("ver"), "p", "op"): Unit)
    val t2 = new Thread(() =>
      Merge.upsertPartitioned(spark, dir, c2, Seq("k"), Seq("ver"), "p", "op"): Unit)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(spark.read.parquet(dir).select("k", "v", "ver").orderBy("k")
      .collect().toSeq == Seq(Row(1L, "a1", 1), Row(2L, "b1", 1)))
  }

  test("scd2Apply drops the broadcast above the key limit, same result") {
    def feedOf(rows: Seq[(Long, Long, String)]) = rows.toDF("k", "t", "attr")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val hist = Merge.scd2(
      feedOf((1L to 40L).map(k => (k, 10L, "v" + (k % 3)))), Seq("k"), "ts", Seq("attr"))
    val batch = feedOf((20L to 60L).map(k => (k, 30L, "w" + (k % 2))))
    val broadcasted = Merge.scd2Apply(hist, batch, Seq("k"), "ts", Seq("attr"))
    val guarded = Merge.scd2Apply(hist, batch, Seq("k"), "ts", Seq("attr"),
      broadcastKeyLimit = 0L) // a backfill-shaped batch: guard must kick in
    val proj = Seq("k", "attr", "valid_from", "valid_to", "is_current")
    assert(guarded.select(proj.map(col): _*).orderBy("k", "valid_from")
      .collect().toSeq ==
      broadcasted.select(proj.map(col): _*).orderBy("k", "valid_from")
        .collect().toSeq)
    // with auto-broadcast off, the guarded path really is a shuffle join
    // (the default path pins BroadcastHashJoin in the spec above)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val g = Merge.scd2Apply(hist, batch, Seq("k"), "ts", Seq("attr"),
        broadcastKeyLimit = 0L)
      g.collect()
      val plan = g.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
