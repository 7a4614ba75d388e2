package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.scale.Multimodal

/** The graft-shards DataSource V2: parity with the mapPartitions reader,
  * one input partition per shard, and content pruning pushed into the
  * scan.
  */
class ShardSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeShards(): (String, Int) = {
    val dir = Files.createTempDirectory("graft-dsv2").toString + "/shards"
    val docs = (0L until 64L).map(i => (i, ("payload-" + i) * 40)).toDF("id", "text")
      .repartition(2)
    // small cap → several shards per partition, so partition planning is
    // actually exercised
    Multimodal.exportPayloadShards(docs, "id", col("text").cast("binary"),
      dir, maxShardBytes = 4L << 10)
    val n = new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar"))
    assert(n > 2, s"expected several shards, got $n")
    (dir, n)
  }

  test("dsv2 rows match the mapPartitions reader; one partition per shard") {
    val (dir, nShards) = writeShards()
    val dsv2 = spark.read.format("graft-shards").load(dir)
    val legacy = Multimodal.readPayloadShards(spark, dir)
    val key = Seq("name")
    val a = dsv2.select(col("name"), md5(col("content")).as("m"))
      .orderBy(key.map(col): _*).collect().toSeq
    val b = legacy.select(col("name"), md5(col("content")).as("m"))
      .orderBy(key.map(col): _*).collect().toSeq
    assert(a == b && a.size == 64)
    assert(dsv2.rdd.getNumPartitions == nShards)
  }

  test("metadata-only projection prunes content out of the scan") {
    val (dir, _) = writeShards()
    val names = spark.read.format("graft-shards").load(dir).select("name")
    names.collect()
    val scanLine = names.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("graft-shards"), scanLine)
    assert(!scanLine.contains("content"), s"content not pruned: $scanLine")
    // and a pure count plans the empty projection without error
    assert(spark.read.format("graft-shards").load(dir).count() == 64)
  }

  test("custom scan metrics: entries counted, pruned bytes accounted") {
    val (dir, _) = writeShards()
    def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = root.collectFirst { case b: BatchScanExec => b }.get
      scan.metrics.map { case (k, m) => k -> m.value }
    }
    val pruned = scanMetrics(
      spark.read.format("graft-shards").load(dir).select("name"))
    assert(pruned("entriesRead") == 64L, pruned)
    assert(pruned("bytesSkipped") > 0L, pruned)
    val full = scanMetrics(
      spark.read.format("graft-shards").load(dir).select("name", "content"))
    assert(full("entriesRead") == 64L && full("bytesSkipped") == 0L, full)
  }

  test("name filter pushdown: shards pruned at planning, one body read") {
    val (dir, nShards) = writeShards()
    // every committed shard must carry its manifest sidecar
    val files = new java.io.File(dir).listFiles()
    val tars = files.filter(_.getName.endsWith(".tar")).map(_.getName).toSet
    val manifests = files.filter(_.getName.endsWith(".tar.manifest"))
      .map(_.getName.stripSuffix(".manifest")).toSet
    assert(tars == manifests, s"manifest per shard: $tars vs $manifests")

    val lookup = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin")
    // pruned at planning: strictly fewer partitions than shards
    assert(lookup.rdd.getNumPartitions < nShards,
      s"${lookup.rdd.getNumPartitions} of $nShards planned — no pruning?")
    val rows = lookup.collect()
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("17.bin"))
    assert(new String(rows(0).getAs[Array[Byte]]("content")) == "payload-17" * 40)

    // the pushed filter is visible in the scan description, and there is
    // no residual Filter node left for the fully-consumed predicate
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = lookup.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = root.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("pushedFilters=[EqualTo(name,17.bin)]"),
      scan.scan.description())
    assert(!root.toString.contains("Filter ("), root.toString)
    // metrics prove it: exactly one entry produced, other bodies skipped
    val m = scan.metrics.map { case (k, mm) => k -> mm.value }
    assert(m("entriesRead") == 1L, m)
    assert(m("bytesSkipped") > 0L, m)
  }

  test("prefix and IN pushdown evaluate exactly; residual filters remain Spark's") {
    val (dir, _) = writeShards()
    val src = spark.read.format("graft-shards").load(dir)
    assert(src.filter(col("name").startsWith("1")).select("name")
      .as[String].collect().sorted.toSeq ==
      (Seq(1L, 10L, 11L, 12L, 13L, 14L, 15L, 16L, 17L, 18L, 19L).map(_ + ".bin")).sorted)
    assert(src.filter(col("name").isin("3.bin", "33.bin", "nope.bin"))
      .count() == 2)
    // a non-pushable predicate (on length(content)) still works post-scan
    assert(src.filter(col("name") === "5.bin" && length(col("content")) > 0)
      .count() == 1)
  }

  test("suffix/contains/not-null predicates push and evaluate exactly") {
    val (dir, _) = writeShards()
    val src = spark.read.format("graft-shards").load(dir)
    // ids 0..63: names ending in "7.bin" → 7,17,27,37,47,57
    assert(src.filter(col("name").endsWith("7.bin")).count() == 6)
    // ids containing digit 3 → 3,13,23,30..39,43,53,63
    assert(src.filter(col("name").contains("3")).count() == 16)
    // Catalyst's IsNotNull conjunct is consumed too: no residual Filter
    val q = src.filter(col("name").isNotNull && col("name") === "9.bin")
    assert(q.count() == 1)
    assert(!q.queryExecution.executedPlan.toString.contains("Filter ("),
      q.queryExecution.executedPlan.toString)
  }

  test("planning statistics shrink with pruning (pushed lookup ≪ full scan)") {
    val (dir, _) = writeShards()
    def size(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = size(spark.read.format("graft-shards").load(dir))
    val pruned = size(spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin"))
    assert(pruned > 0 && pruned < full / 2,
      s"pruned=$pruned full=$full — statistics don't reflect shard pruning")
  }

  test("limit pushdown stops streaming the archive early") {
    val (dir, _) = writeShards()
    val limited = spark.read.format("graft-shards").load(dir).limit(3)
    assert(limited.collect().length == 3) // Spark's global limit holds
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = limited.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = root.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("limit=3"), scan.scan.description())
    // the executed readers emitted only up to the limit each, not their
    // whole shard (64 entries total across shards)
    val entries = scan.metrics("entriesRead").value
    assert(entries > 0 && entries < 64, s"entriesRead=$entries")
  }

  // isolates the PER-SHARD pruning path: without this, the directory
  // AGGREGATE (which has its own degradation tests below) would prune on
  // its own and mask the behavior under test
  private def dropAggregate(dir: String): Unit = {
    val agg = new java.io.File(dir,
      graft.sources.shardsource.ShardAggManifest.FileName)
    assert(agg.delete(), "expected the export-written aggregate manifest")
  }

  test("a manifest whose recorded tar length mismatches is ignored, not trusted") {
    val (dir, nShards) = writeShards()
    dropAggregate(dir)
    // simulate a mismatched tar/manifest pair (a racing attempt's
    // differently-packed tar): bump every manifest's recorded length
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".manifest")).foreach { f =>
        val lines = java.nio.file.Files.readAllLines(f.toPath)
        lines.set(1, (lines.get(1).toLong + 1L).toString)
        java.nio.file.Files.write(f.toPath, lines): Unit
      }
    val lookup = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin")
    // nothing provably prunable — every shard plans, the answer stays right
    assert(lookup.rdd.getNumPartitions == nShards)
    assert(lookup.select("name").as[String].collect().toSeq == Seq("17.bin"))
  }

  test("missing manifests degrade to unpruned-but-correct") {
    val (dir, nShards) = writeShards()
    dropAggregate(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".manifest")).foreach(f => assert(f.delete()))
    val lookup = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin")
    assert(lookup.rdd.getNumPartitions == nShards) // nothing provably prunable
    assert(lookup.select("name").as[String].collect().toSeq == Seq("17.bin"))
  }

  test("shard_path prefix filter prunes on the listing alone") {
    val root = Files.createTempDirectory("graft-dsv2-nest").toString
    val a = (0L until 8L).map(i => (i, "a-" + i)).toDF("id", "text")
    val b = (100L until 108L).map(i => (i, "b-" + i)).toDF("id", "text")
    Multimodal.exportPayloadShards(a, "id", col("text").cast("binary"), root + "/dt=2024-01-01")
    Multimodal.exportPayloadShards(b, "id", col("text").cast("binary"), root + "/dt=2024-01-02")
    val src = spark.read.format("graft-shards").load(root)
    // recursive listing sees both subtrees
    assert(src.count() == 16)
    // and the legacy mapPartitions reader agrees on the nested layout
    assert(Multimodal.readPayloadShards(spark, root).count() == 16)
    val day2 = src.filter(col("shard_path").contains("dt=2024-01-02"))
    assert(day2.count() == 8)
    // contains() IS pushed (StringContains is in ShardFilters.supported):
    // the plan references only the day-2 shards — pinned by the planned
    // partition count (one input partition per surviving shard)
    val day2Shards = day2.select("shard_path").distinct().count()
    assert(day2.rdd.getNumPartitions == day2Shards)
    val pfx = "file:" // sanity: a pushable prefix filter over everything
    assert(src.filter(col("shard_path").startsWith(pfx)).count() == 16)
    // equality on one shard's full uri plans exactly that shard
    val one = src.select("shard_path").as[String].head()
    val eq = spark.read.format("graft-shards").load(root)
      .filter(col("shard_path") === one)
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.select("shard_path").distinct().as[String].collect().toSeq == Seq(one))
  }

  test("missing directory plans zero partitions, .tmp orphans are excluded") {
    val empty = Files.createTempDirectory("graft-dsv2").toString + "/none"
    assert(spark.read.format("graft-shards").load(empty).count() == 0)
    val (dir, _) = writeShards()
    // plant a crashed-attempt orphan; it must not be planned
    val orphan = new java.io.File(dir, "shard-99999-00000.tar.7.tmp")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    assert(spark.read.format("graft-shards").load(dir).count() == 64)
  }

  test("aggregate manifest: one-file-per-dir pruning, safe degradation") {
    val (dir, nShards) = writeShards()
    import graft.sources.shardsource.ShardAggManifest
    val aggFile = new java.io.File(dir, ShardAggManifest.FileName)
    assert(aggFile.exists(), "export must write the aggregate manifest")
    // the aggregate alone can prune: remove every PER-SHARD manifest, so
    // any pruning observed comes from the directory-level blooms
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar.manifest")).foreach(f => assert(f.delete()))
    def lookup() = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin")
    val viaAgg = lookup()
    assert(viaAgg.select("name").as[String].collect().toSeq == Seq("17.bin"))
    val plannedViaAgg = viaAgg.rdd.getNumPartitions
    assert(plannedViaAgg < nShards,
      s"$plannedViaAgg of $nShards planned — aggregate did not prune")
    // torn aggregate degrades to keep-everything (per-shard manifests are
    // gone too) — correct rows, no pruning, never an error
    java.nio.file.Files.write(aggFile.toPath,
      "garbage".getBytes("UTF-8"))
    val torn = lookup()
    assert(torn.select("name").as[String].collect().toSeq == Seq("17.bin"))
    assert(torn.rdd.getNumPartitions == nShards)
    // a STALE byte stamp (shard rewritten after the aggregate was built)
    // keeps that shard: fresh dir, grow one shard on disk, look up a name
    // that lives elsewhere — the plan is exactly {true holder, stamp-
    // mismatched victim}: the aggregate can't vouch for the victim, and
    // the per-shard sweep (length-stamped the same way) keeps it too
    val (dir2, _) = writeShards()
    val victim = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val probe = spark.read.format("graft-shards").load(dir2)
      .filter(!col("shard_path").endsWith(victim.getName))
      .select("name").as[String].head()
    val grown = java.nio.file.Files.readAllBytes(victim.toPath) ++ Array[Byte](0)
    java.nio.file.Files.write(victim.toPath, grown)
    // drop the local-FS checksum sidecar the out-of-band edit invalidated
    // (production rewrites go through the FileSystem API and keep it)
    new java.io.File(victim.getParentFile, "." + victim.getName + ".crc")
      .delete(): Unit
    val stale = spark.read.format("graft-shards").load(dir2)
      .filter(col("name") === probe)
    assert(stale.select("name").as[String].collect().toSeq == Seq(probe))
    assert(stale.rdd.getNumPartitions == 2, "holder + stamp-mismatched victim")
  }

  test("aggregate manifest removes O(shards) sidecar reads from a lookup") {
    val (dir, nShards) = writeShards()
    import graft.sources.shardsource.{ShardAggManifest, ShardManifest}
    def lookup(): Long = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin").count()
    assert(lookup() == 1L) // warm: fills the parsed-aggregate cache
    ShardManifest.reads.set(0L); ShardAggManifest.reads.set(0L)
    assert(lookup() == 1L)
    // the directory's blooms answer from the (mtime-validated) cache —
    // zero or one aggregate read — and only the true holder plus bloom
    // false positives pay a per-shard manifest read
    assert(ShardAggManifest.reads.get() <= 1L)
    val withAgg = ShardManifest.reads.get()
    assert(withAgg < nShards / 2, s"$withAgg of $nShards manifests read")
    // without the aggregate, the sweep reads EVERY candidate's manifest —
    // the linear cost the aggregate exists to remove
    dropAggregate(dir)
    ShardManifest.reads.set(0L)
    assert(lookup() == 1L)
    assert(ShardManifest.reads.get() == nShards,
      s"${ShardManifest.reads.get()} vs $nShards")
  }

  test("listing sidecar: zero listStatus on fresh dirs; staleness degrades to the walk") {
    val (dir, nShards) = writeShards()
    import graft.sources.shardsource.{ShardListingManifest, ShardScan}
    def lookup(): Long = spark.read.format("graft-shards").load(dir)
      .filter(col("name") === "17.bin").count()
    assert(lookup() == 1L) // warm the parsed-listing cache
    ShardScan.listStatusCalls.set(0L)
    val hitsBefore = ShardListingManifest.hits.get()
    assert(lookup() == 1L)
    assert(ShardScan.listStatusCalls.get() == 0L,
      "a fresh listing sidecar must answer discovery without listStatus")
    assert(ShardListingManifest.hits.get() > hitsBefore)
    // a shard landing WITHOUT a sidecar refresh bumps the directory's
    // mtime — the sidecar goes stale, the walk lists, the shard is seen
    Thread.sleep(5) // local-FS mtime granularity
    val one = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    java.nio.file.Files.copy(one.toPath,
      new java.io.File(dir, "shard-zzzzz-00000.tar").toPath)
    ShardScan.listStatusCalls.set(0L)
    assert(spark.read.format("graft-shards").load(dir)
      .rdd.getNumPartitions == nShards + 1,
      "a stale sidecar must degrade to the walk and plan the new shard")
    assert(ShardScan.listStatusCalls.get() >= 1L)
    // rebuilding the sidecar restores flat discovery over the new state
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    ShardListingManifest.write(fs, p): Unit
    ShardScan.listStatusCalls.set(0L)
    assert(spark.read.format("graft-shards").load(dir)
      .rdd.getNumPartitions == nShards + 1)
    assert(ShardScan.listStatusCalls.get() == 0L)
  }

  test("listing sidecar fails CLOSED: same-stamp churn verified, zero dir mtime missed") {
    val (dir, _) = writeShards()
    import graft.sources.shardsource.ShardListingManifest
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    ShardListingManifest.write(fs, p): Unit
    assert(ShardListingManifest.read(fs, p).isDefined)
    // land a shard, then BACK-DATE the directory to the sidecar's own
    // stamp — the coarse-mtime blind spot where add-time == sidecar-time;
    // the equal-stamp verifying read must catch the extra child
    val one = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    java.nio.file.Files.copy(one.toPath,
      new java.io.File(dir, "shard-zzzzz-00000.tar").toPath)
    val sideM = fs.getFileStatus(ShardListingManifest.listPath(p))
      .getModificationTime
    fs.setTimes(p, sideM, -1)
    val vBefore = ShardListingManifest.verified.get()
    assert(ShardListingManifest.read(fs, p).isEmpty,
      "same-stamp churn must not be trusted")
    assert(ShardListingManifest.verified.get() > vBefore,
      "the equal-stamp tie must be broken by a verifying listing")
    // equal stamp with NO churn: verification agrees, the listing serves
    ShardListingManifest.write(fs, p): Unit
    fs.setTimes(p, fs.getFileStatus(ShardListingManifest.listPath(p))
      .getModificationTime, -1)
    assert(ShardListingManifest.read(fs, p).isDefined,
      "a verified equal-stamp sidecar must serve")
    // a directory whose mtime carries no signal (0 — S3A marker-dir
    // semantics) must never validate, fresh sidecar or not
    fs.setTimes(p, 0L, -1)
    assert(ShardListingManifest.read(fs, p).isEmpty,
      "a zero directory mtime must fail closed")
  }

  test("listing fans out above the directory threshold — same shards planned") {
    val (src, _) = writeShards()
    val one = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val oneRows = spark.read.format("graft-shards")
      .load(one.getAbsolutePath).count()
    assert(oneRows > 0)
    // a tree with more directories than ParallelListThreshold: the walk
    // must switch to the Spark-job path and find every shard
    val root = Files.createTempDirectory("graft-dsv2-wide").toString
    val nDirs = graft.sources.shardsource.ShardScan.ParallelListThreshold + 8
    (0 until nDirs).foreach { i =>
      val d = new java.io.File(root, f"dt=2024-01-$i%02d/bucket=0")
      assert(d.mkdirs())
      java.nio.file.Files.copy(one.toPath,
        new java.io.File(d, one.getName).toPath)
    }
    val wide = spark.read.format("graft-shards").load(root)
    assert(wide.rdd.getNumPartitions == nDirs)
    assert(wide.count() == oneRows * nDirs)
  }
}
