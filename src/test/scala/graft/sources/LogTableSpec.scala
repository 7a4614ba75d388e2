package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The commit-log table: atomic single-write merges, optimistic
  * concurrency via the commit rename, time travel, crash invisibility,
  * and vacuum discipline.
  */
class LogTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-logtable").toString

  private def baseDf = Seq(
    (1L, "a", 0, "p1", "U"), (2L, "b", 0, "p1", "U"),
    (3L, "c", 0, "p2", "U"), (4L, "d", 0, "p3", "U"))
    .toDF("k", "v", "ver", "p", "op")

  test("create + read round trip; upsert equals the in-memory merge") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    assert(LogTable.read(spark, dir).orderBy("k").collect().toSeq ==
      baseDf.orderBy("k").collect().toSeq)
    val changes = Seq(
      (1L, "a1", 1, "p1", "U"), (3L, "c", 1, "p2", "D"),
      (9L, "n", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    val v = LogTable.upsert(spark, dir, changes,
      Seq("k"), Seq("ver"), "op")
    assert(v == 2L)
    val expect = Merge.merge(baseDf, changes, Seq("k"), Seq("ver"), "op")
      .orderBy("k").collect().toSeq
    assert(LogTable.read(spark, dir).orderBy("k").collect().toSeq == expect)
  }

  test("merge rewrites only the touched partitions' files") {
    val dir = tmp() + "/t"
    // well-populated partitions + enough writer tasks that the sampled
    // (value, salt) boundaries isolate the values into their own files
    val big = (1L to 60L).map(k => (k, "v" + k, 0, "p" + (k % 3 + 1), "U"))
      .toDF("k", "v", "ver", "p", "op")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val (before, after) =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "12")
        LogTable.create(spark, dir, big, "p")
        val b = LogTable.snapshot(spark, dir)
        val changes = Seq((1L, "a1", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
        LogTable.upsert(spark, dir, changes, Seq("k"), Seq("ver"), "op")
        (b, LogTable.snapshot(spark, dir))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // files of untouched partitions survive by NAME (never rewritten)
    val untouchedBefore = before.files.filter(f => f.pmin == f.pmax && f.pmin != "p1")
    assert(untouchedBefore.nonEmpty)
    untouchedBefore.foreach(f => assert(after.files.map(_.name).contains(f.name), f))
    // p1's old files are gone from the live set
    before.files.filter(f => f.pmin == "p1" && f.pmax == "p1")
      .foreach(f => assert(!after.files.map(_.name).contains(f.name), f))
  }

  test("a file spanning partitions is rewritten whole — no rows lost") {
    val dir = tmp() + "/t"
    // more distinct partition values than shuffle partitions (2 in this
    // session) forces files that SPAN values — the layout the equality
    // prune must treat as always-touched
    val many = (1L to 100L).map(k => (k, "v" + k, 0, f"p${k % 20}%02d", "U"))
      .toDF("k", "v", "ver", "p", "op")
    LogTable.create(spark, dir, many, "p")
    val snap = LogTable.snapshot(spark, dir)
    val spanning = snap.files.filter(f => f.pmin != f.pmax).map(_.name).toSet
    assert(spanning.nonEmpty, snap.files)
    val pruned = LogTable.prunedFiles(snap, Set("p01")).map(_.name).toSet
    assert(spanning.subsetOf(pruned), s"$spanning not all in $pruned")
    // k=1 lives in p01; every other row must ride through the rewrite
    val changes = Seq((1L, "a1", 1, "p01", "U")).toDF("k", "v", "ver", "p", "op")
    LogTable.upsert(spark, dir, changes, Seq("k"), Seq("ver"), "op")
    val out = LogTable.read(spark, dir)
    assert(out.count() == 100)
    assert(out.filter($"k" === 1L).select("v").as[String].head() == "a1")
    assert(out.filter($"k" =!= 1L && !$"v".startsWith("v")).count() == 0)
  }

  test("readPartitions plans only matching and boundary files") {
    val dir = tmp() + "/t"
    val big = (1L to 60L).map(k => (k, "v" + k, 0, "p" + (k % 3 + 1), "U"))
      .toDF("k", "v", "ver", "p", "op")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "12")
      LogTable.create(spark, dir, big, "p")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val all = LogTable.read(spark, dir)
    val one = LogTable.readPartitions(spark, dir, Seq("p2"))
    assert(one.count() == 20)
    assert(one.select("p").distinct().as[String].collect().toSeq == Seq("p2"))
    assert(one.inputFiles.length < all.inputFiles.length,
      s"${one.inputFiles.length} vs ${all.inputFiles.length} — no log pruning")
  }

  test("time travel: historical versions replay the log prefix") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    val changes = Seq((2L, "b9", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    LogTable.upsert(spark, dir, changes, Seq("k"), Seq("ver"), "op")
    assert(LogTable.read(spark, dir, asOf = Some(1L)).orderBy("k")
      .collect().toSeq == baseDf.orderBy("k").collect().toSeq)
    assert(LogTable.read(spark, dir).filter($"k" === 2L)
      .select("v").as[String].head() == "b9")
  }

  test("uncommitted data files are invisible; vacuum reclaims them but never live ones") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    // a crashed writer's moved-but-never-committed file
    val orphan = new java.io.File(dir, "part-crashed-orphan.parquet")
    baseDf.limit(1).write.mode("overwrite")
      .parquet(orphan.toString + ".dir")
    val part = new java.io.File(orphan.toString + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, orphan.toPath)
    assert(LogTable.read(spark, dir).count() == 4) // orphan invisible
    // a writer that died before its renames: whole scratch dir + a torn
    // commit tmp — vacuum must reclaim both
    new java.io.File(dir + "/_tmp_deadbeef").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir + "/_tmp_deadbeef/part-x.parquet").toPath,
      Array[Byte](1))
    java.nio.file.Files.write(
      new java.io.File(dir + "/_graft_log/.commit_dead.tmp").toPath,
      Array[Byte](1))
    val live = LogTable.snapshot(spark, dir).files.map(_.name).toSet
    val deleted = LogTable.vacuum(spark, dir, olderThanMs = 0L)
    assert(deleted == 3, s"deleted $deleted")
    assert(!orphan.exists())
    assert(!new java.io.File(dir + "/_tmp_deadbeef").exists())
    assert(!new java.io.File(dir + "/_graft_log/.commit_dead.tmp").exists())
    assert(LogTable.snapshot(spark, dir).files.map(_.name).toSet == live)
    assert(LogTable.read(spark, dir).count() == 4)
  }

  test("add-column evolution widens the schema without rewriting old files") {
    val dir = tmp() + "/t"
    // well-populated isolated partitions (k%3: k=1→p2, k=2→p3, k=3→p1) so
    // "untouched files survive by name" is a real check, not vacuous
    val big = (1L to 60L).map(k => (k, "v" + k, 0, "p" + (k % 3 + 1), "U"))
      .toDF("k", "v", "ver", "p", "op")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "12")
      LogTable.create(spark, dir, big, "p")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val before = LogTable.snapshot(spark, dir)
    // a batch with a NEW column: one updated + one fresh key, both in p2
    val withTag = Seq((1L, "a1", 1, "p2", "U", "hot"),
      (109L, "n", 1, "p2", "U", "cold"))
      .toDF("k", "v", "ver", "p", "op", "tag")
    // schema drift is LOUD unless evolution is opted into
    val drift = intercept[IllegalArgumentException] {
      LogTable.upsert(spark, dir, withTag, Seq("k"), Seq("ver"), "op")
    }
    assert(drift.getMessage.contains("mergeSchema"))
    LogTable.upsert(spark, dir, withTag, Seq("k"), Seq("ver"), "op",
      mergeSchema = true)
    val now = LogTable.read(spark, dir)
    assert(now.schema.fieldNames.contains("tag"))
    val tags = now.select("k", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tags(1L).contains("hot") && tags(109L).contains("cold"))
    assert(tags(2L).isEmpty && tags(3L).isEmpty) // old files read as NULL
    // untouched partitions' (p1/p3) files were NOT rewritten
    val after = LogTable.snapshot(spark, dir)
    val untouched = before.files.filter(f => f.pmin == f.pmax &&
      f.pmin != "p2").map(_.name)
    assert(untouched.nonEmpty, before.files) // or the check below is vacuous
    untouched.foreach(n => assert(after.files.map(_.name).contains(n), n))
    // history keeps its own schema
    assert(!LogTable.read(spark, dir, asOf = Some(1L))
      .schema.fieldNames.contains("tag"))
    // a batch MISSING an old column null-fills it on its own rows only —
    // and the committed schema turns that column nullable
    LogTable.upsert(spark, dir,
      Seq((2L, 7, "p3", "U")).toDF("k", "ver", "p", "op"),
      Seq("k"), Seq("ver"), "op", mergeSchema = true)
    val vs = LogTable.read(spark, dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(vs(2L).isEmpty && vs(1L).contains("a1"))
    assert(LogTable.snapshot(spark, dir).schema("v").nullable)
    // merge-critical columns can never be NULL-filled, even when evolving
    val crit = intercept[IllegalArgumentException] {
      LogTable.upsert(spark, dir,
        Seq((2L, "x", 8, "p3")).toDF("k", "v", "ver", "p"),
        Seq("k"), Seq("ver"), "op", mergeSchema = true)
    }
    assert(crit.getMessage.contains("merge-critical"))
    // a TYPE change is not evolution, even with evolution opted in
    val e = intercept[IllegalArgumentException] {
      LogTable.upsert(spark, dir,
        Seq((3L, 5, 9, "p1", "U")).toDF("k", "v", "ver", "p", "op"),
        Seq("k"), Seq("ver"), "op", mergeSchema = true)
    }
    assert(e.getMessage.contains("only ADD-column"))
  }

  test("null partition values fail loud at write time") {
    val dir = tmp() + "/t"
    val withNull = Seq((1L, "a", 0, "p1", "U"), (2L, "b", 0, null, "U"))
      .toDF("k", "v", "ver", "p", "op")
    val e = intercept[IllegalArgumentException] {
      LogTable.create(spark, dir, withNull, "p")
    }
    assert(e.getMessage.contains("NULL values in partition column"))
  }

  test("a losing commit race retries against the winner's snapshot") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    // winner: someone else publishes version 2 first
    val w = Seq((2L, "winner", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    LogTable.upsert(spark, dir, w, Seq("k"), Seq("ver"), "op")
    // loser-turned-retry: a batch prepared against version 1 still lands,
    // and BOTH changes survive (the retry merges against the new state)
    val l = Seq((1L, "later", 2, "p1", "U")).toDF("k", "v", "ver", "p", "op")
    assert(LogTable.upsert(spark, dir, l, Seq("k"), Seq("ver"), "op") == 3L)
    val out = LogTable.read(spark, dir).filter($"k".isin(1L, 2L))
      .select("k", "v").orderBy("k").collect().toSeq
    assert(out == Seq(Row(1L, "later"), Row(2L, "winner")))
  }

  test("checkpoint truncates replay; expired versions fail loud, never stale") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    LogTable.upsert(spark, dir,
      Seq((1L, "a1", 1, "p1", "U")).toDF("k", "v", "ver", "p", "op"),
      Seq("k"), Seq("ver"), "op")
    LogTable.upsert(spark, dir,
      Seq((3L, "c1", 1, "p2", "U")).toDF("k", "v", "ver", "p", "op"),
      Seq("k"), Seq("ver"), "op")
    assert(LogTable.checkpoint(spark, dir) == 3L)
    val expected = LogTable.read(spark, dir).orderBy("k").collect().toSeq
    assert(LogTable.expireLog(spark, dir) == 3) // commits 1..3 now redundant
    // replay now starts at the checkpoint — same table
    assert(LogTable.read(spark, dir).orderBy("k").collect().toSeq == expected)
    assert(LogTable.snapshot(spark, dir).version == 3L)
    // the checkpointed version itself is still addressable; earlier ones
    // fail loud instead of silently serving an older state
    assert(LogTable.read(spark, dir, asOf = Some(3L)).orderBy("k")
      .collect().toSeq == expected)
    intercept[IllegalArgumentException] {
      LogTable.read(spark, dir, asOf = Some(2L))
    }
    // and the table keeps accepting commits after expiry
    assert(LogTable.upsert(spark, dir,
      Seq((4L, "d1", 1, "p3", "U")).toDF("k", "v", "ver", "p", "op"),
      Seq("k"), Seq("ver"), "op") == 4L)
    assert(LogTable.read(spark, dir).filter($"k" === 4L)
      .select("v").as[String].head() == "d1")
  }

  test("compaction swaps a partition's small files for few, atomically") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    // age p1 with a wide writer count: each merge rewrites the partition
    // across many salted range tasks, leaving it fragmented — the debt a
    // production shuffle-partition setting (32) creates for small
    // partitions
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "12")
      LogTable.upsert(spark, dir,
        (101L to 108L).map(k => (k, "x" + k, 1, "p1", "U"))
          .toDF("k", "v", "ver", "p", "op"),
        Seq("k"), Seq("ver"), "op")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val before = LogTable.snapshot(spark, dir)
    val p1Before = before.files.count(f => f.pmin == "p1" || f.pmax == "p1")
    assert(p1Before > 2, s"aging produced only $p1Before p1 files")
    val expected = LogTable.read(spark, dir).orderBy("k").collect().toSeq
    // under-budget: no-op, no commit
    assert(LogTable.compactPartitions(spark, dir,
      maxFilesPerPartition = 100) == -1L)
    assert(LogTable.snapshot(spark, dir).version == before.version)
    // over-budget: one commit, fewer p1 files, identical rows
    val v = LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 2)
    assert(v == before.version + 1)
    val after = LogTable.snapshot(spark, dir)
    val p1After = after.files.count(f => f.pmin == "p1" || f.pmax == "p1")
    assert(p1After < p1Before, s"$p1Before -> $p1After")
    assert(p1After <= 2, s"compaction left $p1After files — over its own budget")
    assert(LogTable.read(spark, dir).orderBy("k").collect().toSeq == expected)
    // CONVERGENCE: a second compaction at the same budget is a no-op —
    // the explicit output count keeps the rewrite from re-fragmenting
    assert(LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 2) == -1L)
  }

  test("version numbers are contended: the same version cannot commit twice") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, baseDf, "p")
    // occupy version 2 with a hand-planted (empty) commit
    val snap = LogTable.snapshot(spark, dir)
    val json = ("""{"version":2,"schema":"""" + snap.schemaDdl.replace("\"", "\\\"") +
      """","partitionCol":"p","adds":[],"removes":[]}""")
    java.nio.file.Files.write(
      new java.io.File(dir + "/_graft_log", f"${2L}%020d.json").toPath,
      json.getBytes("UTF-8"))
    // an upsert prepared against v1 must NOT silently collide with v2 —
    // it retries and lands at v3
    val c = Seq((4L, "d1", 1, "p3", "U")).toDF("k", "v", "ver", "p", "op")
    assert(LogTable.upsert(spark, dir, c, Seq("k"), Seq("ver"), "op") == 3L)
    assert(LogTable.read(spark, dir).filter($"k" === 4L)
      .select("v").as[String].head() == "d1")
  }
}
