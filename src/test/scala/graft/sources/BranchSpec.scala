package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Branches, tags and write-audit-publish: a branch stages work in
  * isolation (main never moves), `ops/Validate` audits the branch read,
  * and a fast-forward publish lands the branch's final state on main as
  * ONE metadata commit; a main that advanced refuses the publish loud.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-branch").toString

  private def seed = (1L to 30L)
    .map(i => (i, s"v$i", i * 10L, s"p${i % 3}"))
    .toDF("k", "v", "cents", "p")

  test("branch isolation: every operation works on the branch, main is " +
    "byte-identical until publish; FF publish is one metadata commit") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val mainV = LogTable.snapshot(spark, dir).version
    val bp = LogTable.createBranch(spark, dir, "wap")
    // stage: append + update + predicate delete ON THE BRANCH
    LogTable.append(spark, bp,
      Seq((100L, "new", 1000L, "p0")).toDF("k", "v", "cents", "p")): Unit
    LogTable.updateWhere(spark, bp, col("k") === 3L,
      Map("v" -> lit("upd"))): Unit
    LogTable.deleteWhere(spark, bp, col("k") === 5L): Unit
    // audit the branch with Validate — the WAP gate
    graft.ops.Validate.enforce(LogTable.read(spark, bp), Seq(
      graft.ops.Validate.notNull("v"),
      graft.ops.Validate.unique("k"),
      graft.ops.Validate.minRows(30L)))
    // main: untouched, same version, same content
    assert(LogTable.snapshot(spark, dir).version == mainV)
    assert(LogTable.read(spark, dir).count() == 30L)
    assert(LogTable.read(spark, dir).filter(col("k") === 100L).count() == 0L)
    assert(LogTable.read(spark, dir).filter(col("v") === "upd").count() == 0L)
    // publish: one commit on main carrying the branch's net state
    val pv = LogTable.publishBranch(spark, dir, "wap")
    assert(pv == mainV + 1, "fast-forward publish is ONE commit")
    val main = LogTable.read(spark, dir)
    assert(main.count() == 30L) // 30 − deleted + appended
    assert(main.filter(col("k") === 100L).count() == 1L)
    assert(main.filter(col("k") === 3L).select("v")
      .as[String].head() == "upd")
    assert(main.filter(col("k") === 5L).count() == 0L)
    // time travel behind the publish still serves the pre-WAP state
    assert(LogTable.read(spark, dir, asOf = Some(mainV)).count() == 30L)
    assert(LogTable.read(spark, dir, asOf = Some(mainV))
      .filter(col("k") === 100L).count() == 0L)
    // a further ordinary write on main works; compaction re-localizes
    LogTable.append(spark, dir,
      Seq((101L, "post", 1L, "p1")).toDF("k", "v", "cents", "p")): Unit
    LogTable.compactPartitions(spark, dir, maxFilesPerPartition = 1): Unit
    assert(LogTable.read(spark, dir).count() == 31L)
    assert(LogTable.snapshot(spark, dir).files
      .forall(f => !f.name.contains("_branches/")),
      "compaction must re-localize published branch files into main")
    LogTable.dropBranch(spark, dir, "wap")
    assert(LogTable.read(spark, dir).count() == 31L)
  }

  test("non-fast-forward publish REBASES when the file sets are " +
    "disjoint, refuses on overlap or metadata drift; schema evolved on " +
    "the branch publishes atomically with its rows") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    // DISJOINT: branch appends one file, main appends another — the
    // staged work re-bases onto the advanced head in one commit
    val b1 = LogTable.createBranch(spark, dir, "b1")
    LogTable.append(spark, b1,
      Seq((100L, "b", 1L, "p1")).toDF("k", "v", "cents", "p")): Unit
    LogTable.append(spark, dir,
      Seq((200L, "m", 2L, "p2")).toDF("k", "v", "cents", "p")): Unit
    val vPre = LogTable.snapshot(spark, dir).version
    assert(LogTable.publishBranch(spark, dir, "b1") == vPre + 1,
      "disjoint work re-bases in ONE commit")
    val afterRebase = LogTable.read(spark, dir)
    assert(afterRebase.filter(col("k") === 100L).count() == 1L &&
      afterRebase.filter(col("k") === 200L).count() == 1L,
      "both sides' rows survive the rebase")
    LogTable.dropBranch(spark, dir, "b1")
    // OVERLAP: both sides rewrite the same files — refuse loud
    val bo = LogTable.createBranch(spark, dir, "bo")
    LogTable.updateWhere(spark, bo, col("k") <= 5L,
      Map("cents" -> (col("cents") + 1L))): Unit
    LogTable.updateWhere(spark, dir, col("k") <= 5L,
      Map("cents" -> (col("cents") + 2L))): Unit
    val eo = intercept[IllegalArgumentException] {
      LogTable.publishBranch(spark, dir, "bo")
    }
    assert(eo.getMessage.contains("fast-forward") &&
      eo.getMessage.contains("touched"), eo.getMessage)
    LogTable.dropBranch(spark, dir, "bo")
    // METADATA DRIFT: main changed a property mid-stage — even disjoint
    // file sets refuse (a rebase must not roll main's metadata back)
    val bm = LogTable.createBranch(spark, dir, "bm")
    LogTable.append(spark, bm,
      Seq((300L, "x", 3L, "p0")).toDF("k", "v", "cents", "p")): Unit
    LogTable.setProperties(spark, dir, Map("owner" -> "ops")): Unit
    val em = intercept[IllegalArgumentException] {
      LogTable.publishBranch(spark, dir, "bm")
    }
    assert(em.getMessage.contains("properties changed"), em.getMessage)
    LogTable.dropBranch(spark, dir, "bm")
    // a fresh branch off the new head: evolve schema + write, publish
    val bp = LogTable.createBranch(spark, dir, "b2")
    import org.apache.spark.sql.connector.catalog.TableChange
    LogTable.evolveSchema(spark, bp, Seq(TableChange.addColumn(
      Array("note"), org.apache.spark.sql.types.StringType, true))): Unit
    LogTable.append(spark, bp,
      Seq((300L, "b", 3L, "p0", "hello"))
        .toDF("k", "v", "cents", "p", "note")): Unit
    LogTable.publishBranch(spark, dir, "b2"): Unit
    val main = LogTable.read(spark, dir)
    assert(main.schema.fieldNames.contains("note"))
    assert(main.filter(col("note") === "hello").count() == 1L)
    // 30 seed rows + the rebase-published k=100 + main's own k=200
    assert(main.filter(col("note").isNull).count() == 32L)
  }

  test("a failed audit keeps main clean — the branch is simply dropped; " +
    "branch DV deletes and merges publish correctly") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val bp = LogTable.createBranch(spark, dir, "audit")
    LogTable.append(spark, bp,
      Seq((400L, null.asInstanceOf[String], 4L, "p1"))
        .toDF("k", "v", "cents", "p")): Unit
    intercept[IllegalStateException] {
      graft.ops.Validate.enforce(LogTable.read(spark, bp),
        Seq(graft.ops.Validate.notNull("v")))
    }
    LogTable.dropBranch(spark, dir, "audit")
    assert(LogTable.read(spark, dir).count() == 30L)
    assert(!new java.io.File(bp).exists(), "unpublished branch dir dies")
    // DV delete + merge on a branch publish as net state
    val bp2 = LogTable.createBranch(spark, dir, "dv")
    LogTable.deleteWhere(spark, bp2, col("k") === 7L,
      deletionVectors = true): Unit
    LogTable.mergeInto(spark, bp2,
      Seq((8L, "m8", 80L, "p2")).toDF("k", "v", "cents", "p"), Seq("k"))
      .whenMatchedUpdate(Map("v" -> "s.v")).run(): Unit
    LogTable.publishBranch(spark, dir, "dv"): Unit
    val main = LogTable.read(spark, dir)
    assert(main.count() == 29L)
    assert(main.filter(col("k") === 8L).select("v").as[String].head() == "m8")
  }

  test("dropBranch protects files referenced by OLDER main versions: " +
    "time travel across a publish survives the drop") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val bp = LogTable.createBranch(spark, dir, "tt")
    LogTable.append(spark, bp,
      Seq((500L, "stage", 5L, "p0")).toDF("k", "v", "cents", "p")): Unit
    val pv = LogTable.publishBranch(spark, dir, "tt")
    // the published row's file lives in the branch dir; a later rewrite
    // RETIRES it from the current snapshot
    LogTable.deleteWhere(spark, dir, col("k") === 500L): Unit
    assert(LogTable.read(spark, dir).count() == 30L)
    LogTable.dropBranch(spark, dir, "tt")
    // time travel to the published version must still read the row
    assert(LogTable.read(spark, dir, asOf = Some(pv))
      .filter(col("k") === 500L).count() == 1L,
      "dropBranch must keep files older main versions still reference")
  }

  test("dropBranch reads PARQUET checkpoints for its reference " +
    "protection — a version witnessed only by checkpoint parts still " +
    "pins the branch file") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"),
      tableProperties = Map(LogTable.CkptFormatProp -> "parquet",
        LogTable.CkptPartRowsProp -> "2"))
    LogTable.createBranch(spark, dir, "pc"): Unit
    LogTable.append(spark, LogTable.branchDir(dir, "pc"),
      Seq((800L, "pc", 8L, "p0")).toDF("k", "v", "cents", "p")): Unit
    val pv = LogTable.publishBranch(spark, dir, "pc")
    // checkpoint at the publish, then expire the commit JSONs — the
    // published version's ONLY witness is now the parquet checkpoint
    LogTable.checkpoint(spark, dir): Unit
    LogTable.expireLog(spark, dir): Unit
    LogTable.deleteWhere(spark, dir, col("k") === 800L): Unit
    LogTable.dropCachedSnapshots(spark, dir)
    LogTable.dropBranch(spark, dir, "pc")
    assert(LogTable.read(spark, dir, asOf = Some(pv))
      .filter(col("k") === 800L).count() == 1L,
      "the checkpoint-witnessed version must survive the drop")
  }

  test("publishing a branch of a table that is ITSELF a clone keeps the " +
    "table's own clone.source provenance") {
    val root = tmp()
    val src = root + "/src"
    val main = root + "/main"
    LogTable.create(spark, src, seed, Seq("p"), statsCols = Seq("k"))
    LogTable.clone(spark, src, main): Unit
    val provBefore = LogTable.snapshot(spark, main).properties("clone.source")
    LogTable.createBranch(spark, main, "b"): Unit
    LogTable.append(spark, LogTable.branchDir(main, "b"),
      Seq((600L, "x", 6L, "p1")).toDF("k", "v", "cents", "p")): Unit
    LogTable.publishBranch(spark, main, "b"): Unit
    assert(LogTable.snapshot(spark, main).properties.get("clone.source")
      .contains(provBefore),
      "publish must restore main's own clone provenance")
  }

  test("tags: immutable named versions resolve for reads; re-tagging " +
    "refuses; dropTag frees the name") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val v1 = LogTable.tag(spark, dir, "release-1")
    LogTable.deleteWhere(spark, dir, col("k") <= 10L): Unit
    assert(LogTable.read(spark, dir).count() == 20L)
    assert(LogTable.readTag(spark, dir, "release-1").count() == 30L)
    assert(LogTable.tagVersion(spark, dir, "release-1") == v1)
    intercept[IllegalArgumentException] {
      LogTable.tag(spark, dir, "release-1")
    }
    LogTable.dropTag(spark, dir, "release-1")
    intercept[IllegalArgumentException] {
      LogTable.tagVersion(spark, dir, "release-1")
    }
    LogTable.tag(spark, dir, "release-1", Some(2L)): Unit
    assert(LogTable.readTag(spark, dir, "release-1").count() == 20L)
  }

  test("two DISJOINT branches racing to publish off the same base: " +
    "both land (the loser re-bases); two OVERLAPPING branches: exactly " +
    "one wins and the loser refuses, never a torn state") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    Seq("r1", "r2").foreach { n =>
      LogTable.createBranch(spark, dir, n): Unit
      LogTable.append(spark, LogTable.branchDir(dir, n),
        Seq((1000L + n.last.toLong, n, 1L, "p0"))
          .toDF("k", "v", "cents", "p")): Unit
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def race(names: Seq[String]): Seq[Either[String, Long]] =
      names.map { n =>
        pool.submit(new java.util.concurrent.Callable[Either[String, Long]] {
          override def call(): Either[String, Long] =
            try Right(LogTable.publishBranch(spark, dir, n))
            catch { case e: IllegalArgumentException => Left(e.getMessage) }
        })
      }.map(_.get())
    val results = race(Seq("r1", "r2"))
    assert(results.forall(_.isRight),
      s"disjoint appends both publish (the loser re-bases): $results")
    assert(results.collect { case Right(v) => v }.distinct.size == 2,
      "two separate commits")
    assert(LogTable.read(spark, dir).filter(col("k") >= 1000L).count() == 2L)
    // OVERLAPPING: both branches rewrite the same base files
    Seq("o1", "o2").foreach { n =>
      LogTable.createBranch(spark, dir, n): Unit
      LogTable.updateWhere(spark, LogTable.branchDir(dir, n),
        col("k") <= 5L, Map("cents" -> (col("cents") + 1L))): Unit
    }
    val results2 = try race(Seq("o1", "o2")) finally pool.shutdown()
    assert(results2.count(_.isRight) == 1,
      s"exactly one overlapping winner: $results2")
    val Left(msg) = results2.find(_.isLeft).get: @unchecked
    assert(msg.contains("fast-forward"), msg)
    // the winner's +1 landed exactly once
    assert(LogTable.read(spark, dir).filter(col("k") <= 5L)
      .select(sum(col("cents"))).as[Long].head() ==
      seed.filter(col("k") <= 5L).select(sum(col("cents") + 1L))
        .as[Long].head())
  }

  test("vacuum reclaims a dead branch's unreferenced files but keeps " +
    "the ones main still references absolutely") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val bp = LogTable.createBranch(spark, dir, "dead")
    LogTable.append(spark, bp,
      Seq((900L, "keep", 9L, "p0")).toDF("k", "v", "cents", "p")): Unit
    LogTable.publishBranch(spark, dir, "dead"): Unit
    // simulate a crashed/hand-deleted branch LOG (dropBranch not run):
    // data files linger in the branch dir with no owning log
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(bp, "_graft_log"), true): Unit
    // drop a stray unreferenced file next to the published one
    val stray = new org.apache.hadoop.fs.Path(bp, "stray.parquet")
    val out = fs.create(stray, true); out.write(1); out.close()
    // age the dead branch's clone marker past the pending-grace window
    // (a marker with no materialized clone younger than the grace is
    // treated as an IN-FLIGHT clone and suspends reclaim — correct in
    // production, just slow for a test)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir, "_graft_clones"))
      .foreach(st => fs.setTimes(st.getPath, 1000L, 1000L))
    LogTable.dropCachedSnapshots(spark, dir)
    LogTable.vacuum(spark, dir, olderThanMs = 0L, force = true): Unit
    assert(!fs.exists(stray), "unreferenced dead-branch files reclaim")
    assert(LogTable.read(spark, dir).filter(col("k") === 900L).count() == 1L,
      "files main references absolutely must survive the vacuum")
  }

  test("SQL surface: CREATE/PUBLISH/DROP BRANCH and CREATE/DROP TAG") {
    val dir = tmp() + "/t"
    org.apache.spark.sql.GraftBridge.installFunctions(spark,
      new graft.expr.GraftExtensions().apply)
    LogTable.create(spark, dir, seed, Seq("p"), statsCols = Seq("k"))
    val bp = spark.sql(s"ALTER TABLE graft.`$dir` CREATE BRANCH sqlwap")
      .collect().head.getString(0)
    assert(bp.endsWith("_branches/sqlwap"))
    LogTable.append(spark, bp,
      Seq((700L, "sql", 7L, "p2")).toDF("k", "v", "cents", "p")): Unit
    val pv = spark.sql(s"ALTER TABLE graft.`$dir` PUBLISH BRANCH sqlwap")
      .collect().head.getString(0).toLong
    assert(pv == 2L)
    assert(LogTable.read(spark, dir).filter(col("k") === 700L).count() == 1L)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP BRANCH sqlwap").collect(): Unit
    val tv = spark.sql(
      s"ALTER TABLE graft.`$dir` CREATE TAG rel AS OF VERSION 1")
      .collect().head.getLong(0)
    assert(tv == 1L)
    assert(LogTable.readTag(spark, dir, "rel").count() == 30L)
    spark.sql(s"ALTER TABLE graft.`$dir` DROP TAG rel").collect(): Unit
    intercept[IllegalArgumentException] {
      LogTable.tagVersion(spark, dir, "rel")
    }
  }
}
