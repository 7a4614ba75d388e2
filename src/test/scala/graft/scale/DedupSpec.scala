package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup operators: exactness of the hash-dedup, MinHash-LSH recall vs the
  * blocked brute-force baseline, SimHash stability — on the sf0.001 tables.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exactDedup keeps exactly one row per content key") {
    val out = Dedup.exactDedup(docs, Dedup.contentKey(col("text"), 4), col("doc_id"))
    val keys = out.groupBy("content_key").count().filter(col("count") > 1).count()
    assert(keys == 0)
    // every kept doc_id is the min of its group
    val total = docs.select(Dedup.contentKey(col("text"), 4)).distinct().count()
    assert(out.count() == total)
  }

  test("exactDedup picks one deterministic survivor under duplicate tie-breaks") {
    // two rows in k1 share the minimal tieBreak (score=1) — the survivor
    // must be exactly one row, chosen by the full-row ordering, and no
    // cross-group row may leak in (the old join-back formulation matched
    // any row whose tieBreak equaled any group's min).
    val df = Seq(
      ("k1", 1, 100L), ("k1", 1, 101L), ("k1", 2, 102L),
      ("k2", 1, 200L), ("k2", 3, 201L)
    ).toDF("content", "score", "row_id")
    val out = Dedup.exactDedup(df, col("content"), col("score"))
    val rows = out.select(col("content_key"), col("score"), col("row_id"), col("group_size"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(rows == Set(("k1", 1, 100L, 3L), ("k2", 1, 200L, 2L)))
  }

  test("exactDedup: NULL tieBreak loses to any non-NULL row") {
    // old min(tieBreak)+join ignored NULLs; the min-struct formulation made
    // NULL win (struct ordering is nulls-first) — pin the NULL-loses rule.
    val df = Seq(
      ("k1", Some(5), 100L), ("k1", None, 101L),
      ("k2", None, 200L), ("k2", None, 201L)
    ).toDF("content", "score", "row_id")
    val out = Dedup.exactDedup(df, col("content"), col("score"))
      .select(col("content_key"), col("row_id")).as[(String, Long)].collect().toSet
    // k1: non-NULL score survives; k2: all-NULL group still keeps one row
    assert(out == Set(("k1", 100L), ("k2", 200L)))
  }

  test("exactDedup carries non-orderable (map) columns as payload") {
    val df = Seq(
      ("k1", 2, Map("a" -> 1)), ("k1", 1, Map("b" -> 2)),
      ("k2", 7, Map("c" -> 3))
    ).toDF("content", "score", "attrs")
    val out = Dedup.exactDedup(df, col("content"), col("score"))
    val rows = out.select(col("content_key"), col("score"), col("attrs"))
      .as[(String, Int, Map[String, Int])].collect().toSet
    assert(rows == Set(("k1", 1, Map("b" -> 2)), ("k2", 7, Map("c" -> 3))))
  }

  test("exactDedup is idempotent") {
    val once = Dedup.exactDedup(docs, Dedup.contentKey(col("text"), 4), col("doc_id"))
      .drop("content_key", "group_size")
    val twice = Dedup.exactDedup(once, Dedup.contentKey(col("text"), 4), col("doc_id"))
    assert(once.count() == twice.count())
  }

  test("minhash LSH finds high-similarity pairs with high recall") {
    // ground truth: all-pairs Jaccard over the SAME 3-shingle sets the
    // LSH path verifies with
    val sets = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    val truth = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("sim"))
      .filter(col("sim") >= 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test data should contain 0.95-similar pairs")
    // every LSH pair is exact-verified → no false positives by construction
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (found ${found.size} of ${truth.size})")
  }

  test("minhash pairs carry exact Jaccard similarities (clone pairs = 1.0)") {
    import org.apache.spark.sql.Row
    val found = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 6, threshold = 0.95)
    // exact duplicates (same normalized content) must appear with sim 1.0
    val clones = docs.select(Dedup.contentKey(col("text")).as("ck"), col("doc_id"))
    val clonePairs = clones.as("a").join(clones.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    val foundOnes = found.filter(col("sim") === 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clonePairs.subsetOf(foundOnes),
      s"${clonePairs.size} clone pairs should all surface with sim=1.0")
    // no duplicate pairs in the output
    val n = found.count()
    assert(found.select("id_a", "id_b").distinct().count() == n)
  }

  test("simhash: identical text → identical signature; near docs → small hamming") {
    val withSig = docs.select(col("doc_id"), col("text"), Dedup.simhash(col("text")).as("sig"))
    val a = withSig.filter(col("doc_id") === 0).select("sig").head().getLong(0)
    val aAgain = docs.filter(col("doc_id") === 0)
      .select(Dedup.simhash(col("text"))).head().getLong(0)
    assert(a == aAgain) // deterministic
    // hamming distance to itself is zero
    val d = withSig.filter(col("doc_id") === 0)
      .select(Dedup.hamming(col("sig"), lit(a))).head().getInt(0)
    assert(d == 0)
  }

  test("simhashPairs equals the brute-force hamming join (pigeonhole loses nothing)") {
    val sigs = docs.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sig"))
    val truth = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Dedup.hamming(col("a.sig"), col("b.sig")).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(truth.nonEmpty, "test data should contain hamming<=3 simhash pairs")
    assert(found == truth)
  }

  test("simhashPairs on the md5 60-bit family equals its brute-force hamming join") {
    val sigs = docs.select(col("doc_id").as("id"), Dedup.simhashMd5(col("text")).as("sig"))
    val truth = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Dedup.hamming(col("a.sig"), col("b.sig")).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
        sigOf = Dedup.simhashMd5(_), bits = 60)
      .as[(Long, Long, Int)].collect().toSet
    assert(truth.nonEmpty, "test data should contain hamming<=3 md5-simhash pairs")
    assert(found == truth)
  }

  test("shingles: sliding word windows, distinct; short docs fall back to whole text") {
    val df = Seq("a b c d", "x y").toDF("text")
    val out = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y"))
  }

  test("connectedComponents: transitive closure, min-id labels, sizes") {
    // triangle {20,21,22}, chain {1,2,3} (1~3 never emitted), pair {10,11}
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("connectedComponents handles an empty edge list (no pairs found)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
    assert(Dedup.connectedComponentsBigStar(empty, "id_a", "id_b").count() == 0)
  }

  test("persisted-index probe matches recompute-world incremental dedup edge cases") {
    // corpus: base doc (id 0) + an exact clone (id 2) + an unrelated doc (id 4)
    // batch:  exact clone of corpus (1: dropped by the key anti-join),
    //         near-dup of corpus (3: dropped by the probe),
    //         two identical fresh docs (5, 7: clones of EACH OTHER survive
    //         together — only corpus relations drop batch docs),
    //         unrelated fresh doc (9: survives)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 29).map(i => s"w$i").mkString(" ") + " zz"
    val fresh = (1 to 30).map(i => s"f$i").mkString(" ")
    val all = Seq(
      (0L, base), (2L, base), (4L, "totally different content here"),
      (1L, base), (3L, near), (5L, fresh), (7L, fresh), (9L, "another island of text"))
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") % 2 === 0)
    val batch = all.filter(col("doc_id") % 2 === 1)
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", "g81s_idx", numBuckets = 2)
    val out = Dedup.probeMinhashIndex(corpus, batch, "doc_id", "text", "g81s_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out == Set(5L, 7L, 9L))
  }

  test("index append: probe-after-append equals probe-after-rebuild, re-ingest is a no-op") {
    // day 0: corpus; day 1: batch1 (one corpus near-dup 3, one fresh pair
    // 5/7, one island 9); day 2: batch2 probes content related to BATCH1
    // docs (11: near-dup of batch1's fresh content — only the appended
    // index state can drop it), plus a fresh doc (13).
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"f$i").mkString(" ")
    val nearFresh = (1 to 29).map(i => s"f$i").mkString(" ") + " qq"
    val corpus = Seq((0L, base), (4L, "totally different content here"))
      .toDF("doc_id", "text")
    val batch1 = Seq(
      (3L, (1 to 29).map(i => s"w$i").mkString(" ") + " zz"),
      (5L, fresh), (7L, fresh), (9L, "another island of text"))
      .toDF("doc_id", "text")
    val batch2 = Seq((11L, nearFresh), (13L, "yet another unrelated island"))
      .toDF("doc_id", "text")

    Dedup.buildMinhashIndex(corpus, "doc_id", "text", "g88a_idx", numBuckets = 2)
    // materialize the survivors before appending (the probe plan reads the
    // index tables the append mutates — the documented contract: a real
    // pipeline lands accepted rows in the corpus store first)
    val acc1 = Dedup.probeMinhashIndex(corpus, batch1, "doc_id", "text", "g88a_idx")
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    assert(acc1.select(col("doc_id")).as[Long].collect().toSet == Set(5L, 7L, 9L))
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g88a_idx", numBuckets = 2)

    val ingested = corpus.unionAll(acc1)
    val appended = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g88a_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    // 11 is a near-dup of batch1's accepted fresh content -> dropped
    assert(appended == Set(13L))

    // full rebuild over everything ingested so far must agree exactly
    Dedup.buildMinhashIndex(ingested, "doc_id", "text", "g88b_idx", numBuckets = 2)
    val rebuilt = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g88b_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(rebuilt == appended)

    // idempotent re-ingest: appending the same accepted batch again must
    // leave all three index tables untouched
    val before = Seq("g88a_idx_keys", "g88a_idx_buckets", "g88a_idx_sigs")
      .map(t => spark.table(t).count())
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g88a_idx", numBuckets = 2)
    val after = Seq("g88a_idx_keys", "g88a_idx_buckets", "g88a_idx_sigs")
      .map(t => spark.table(t).count())
    assert(after == before)
  }

  test("index append crash recovery: a torn append (keys missing) converges on rerun") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"f$i").mkString(" ")
    val nearFresh = (1 to 29).map(i => s"f$i").mkString(" ") + " qq"
    val corpus = Seq((0L, base), (4L, "totally different content here"))
      .toDF("doc_id", "text")
    val batch1 = Seq((5L, fresh), (9L, "another island of text"))
      .toDF("doc_id", "text")
    val batch2 = Seq((11L, nearFresh), (13L, "yet another unrelated island"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", "g88c_idx", numBuckets = 2)
    val acc1 = Dedup.probeMinhashIndex(corpus, batch1, "doc_id", "text", "g88c_idx")
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    // snapshot the pre-append key set, append fully, then roll the keys
    // table back — reproducing EXACTLY the torn state of a crash between
    // the sig/bucket appends and the keys append
    val keysBefore = spark.table("g88c_idx_keys").as[String].collect().toSeq.toDF("ck")
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g88c_idx", numBuckets = 2)
    graft.sources.Sources.writeBucketed(keysBefore, "g88c_idx_keys", Seq("ck"), 2)
    // recovery rerun: contents look fresh again, everything re-appends
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g88c_idx", numBuckets = 2)
    // the torn state really left duplicate sig rows behind (degraded, not clean)
    val ingested = corpus.unionAll(acc1)
    Dedup.buildMinhashIndex(ingested, "doc_id", "text", "g88d_idx", numBuckets = 2)
    assert(spark.table("g88c_idx_sigs").count() > spark.table("g88d_idx_sigs").count())
    // and the probe result is STILL identical to a clean rebuild
    val recovered = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g88c_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    val rebuilt = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g88d_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(recovered == Set(13L) && rebuilt == recovered)
  }

  test("index compaction: torn-append duplicates dropped, small files repaid, probe unchanged") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"f$i").mkString(" ")
    val nearFresh = (1 to 29).map(i => s"f$i").mkString(" ") + " qq"
    val corpus = Seq((0L, base), (4L, "totally different content here"))
      .toDF("doc_id", "text")
    val batch1 = Seq((5L, fresh), (9L, "another island of text"))
      .toDF("doc_id", "text")
    val batch2 = Seq((11L, nearFresh), (13L, "yet another unrelated island"))
      .toDF("doc_id", "text")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", "g102c_idx", numBuckets = 2)
    val acc1 = Dedup.probeMinhashIndex(corpus, batch1, "doc_id", "text", "g102c_idx")
      .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
    // torn append + recovery rerun: leaves the documented debris —
    // duplicate signature/bucket rows — that compaction exists to drop
    val keysBefore = spark.table("g102c_idx_keys").as[String].collect().toSeq.toDF("ck")
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g102c_idx", numBuckets = 2)
    graft.sources.Sources.writeBucketed(keysBefore, "g102c_idx_keys", Seq("ck"), 2)
    Dedup.appendToMinhashIndex(acc1, "doc_id", "text", "g102c_idx", numBuckets = 2)
    val ingested = corpus.unionAll(acc1)
    val probeBefore = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g102c_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    val sigsBefore = spark.table("g102c_idx_sigs").count()
    val sigFilesBefore = spark.table("g102c_idx_sigs").inputFiles.length
    val stats = Dedup.compactMinhashIndex(spark, "g102c_idx", numBuckets = 2)
    // the duplicates are really gone: compacted sigs == a clean rebuild's
    Dedup.buildMinhashIndex(ingested, "doc_id", "text", "g102d_idx", numBuckets = 2)
    assert(spark.table("g102c_idx_sigs").count() == spark.table("g102d_idx_sigs").count())
    assert(spark.table("g102c_idx_sigs").count() < sigsBefore)
    // small-files debt repaid, and the returned stats record both deltas
    assert(spark.table("g102c_idx_sigs").inputFiles.length < sigFilesBefore)
    val st = stats.find(_.table == "g102c_idx_sigs").get
    assert(st.rowsBefore == sigsBefore && st.rowsAfter < st.rowsBefore
      && st.filesAfter < st.filesBefore)
    // the bucketed layout survives the swap — the zero-corpus-shuffle
    // probe joins depend on it
    assert(spark.sql("DESCRIBE EXTENDED g102c_idx_sigs")
      .filter(col("col_name") === "Num Buckets").head().getString(1) == "2")
    // and the probe answer is identical
    val probeAfter = Dedup.probeMinhashIndex(ingested, batch2, "doc_id", "text", "g102c_idx")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(probeAfter == probeBefore && probeAfter == Set(13L))
  }

  test("compactTable: torn-swap window (live dropped, rename pending) auto-recovers on rerun") {
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v")
    graft.sources.Sources.writeBucketed(df, "gcmp_t", Seq("id"), 2)
    // the complete compacted copy landed; crash after DROP, before RENAME
    graft.sources.Sources.writeBucketed(df.distinct(), "gcmp_t__compact", Seq("id"), 2)
    spark.sql("DROP TABLE gcmp_t")
    val st = graft.sources.Sources.compactTable(spark, "gcmp_t", Seq("id"), 2)
    assert(spark.catalog.tableExists("gcmp_t"))
    assert(!spark.catalog.tableExists("gcmp_t__compact"))
    assert(spark.table("gcmp_t").as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b")))
    assert(st.rowsAfter == 2)
  }

  test("compactIfNeeded: debt-triggered, no-op within budget, quiet after the rewrite") {
    val df = (1L to 40L).toDF("id").withColumn("k", col("id") % 4)
    graft.sources.Sources.writeBucketed(df, "gcin_t", Seq("k"), 4)
    // freshly built: within the file budget — policy must not rewrite
    assert(graft.sources.Sources.compactIfNeeded(spark, "gcin_t", Seq("k"), 4,
      maxFilesPerBucket = 4).isEmpty)
    // replayed appends accumulate small-files debt (and duplicate rows)
    (1 to 8).foreach { _ =>
      graft.sources.Sources.writeBucketed(df, "gcin_t", Seq("k"), 4,
        org.apache.spark.sql.SaveMode.Append)
    }
    assert(spark.table("gcin_t").inputFiles.length > 16)
    val st = graft.sources.Sources.compactIfNeeded(spark, "gcin_t", Seq("k"), 4,
      maxFilesPerBucket = 4)
    assert(st.nonEmpty && st.get.rowsAfter == 40 && st.get.rowsBefore == 360)
    // one file per OCCUPIED bucket (bucket id = murmur3(k) pmod 4, so
    // distinct keys may share a bucket — ≤ numBuckets files, never more)
    assert(spark.table("gcin_t").inputFiles.length <= 4)
    assert(spark.table("gcin_t").inputFiles.length < st.get.filesBefore)
    // debt repaid: the next daily call is a metadata no-op
    assert(graft.sources.Sources.compactIfNeeded(spark, "gcin_t", Seq("k"), 4,
      maxFilesPerBucket = 4).isEmpty)
  }

  test("storedBucketStats: persisted bucket sizes aggregate with an oversized count") {
    val docs = Seq((0L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    Dedup.buildMinhashIndex(docs, "doc_id", "text", "g102s_idx", numBuckets = 2)
    val relaxed = Dedup.storedBucketStats(spark, "g102s_idx_buckets",
      Seq("bband", "bhash"), maxBucketSize = 1024).head()
    assert(relaxed.getLong(0) > 0 && relaxed.getLong(2) == 0L)
    // cap 0: every stored bucket counts as oversized — the alert fires
    val strict = Dedup.storedBucketStats(spark, "g102s_idx_buckets",
      Seq("bband", "bhash"), maxBucketSize = 0).head()
    assert(strict.getLong(2) == strict.getLong(0))
  }

  test("both CC impls emit a self-loop-only node as its own singleton cluster") {
    // (5,5) is a node whose ONLY edge is a self-loop; (2,2) is a self-loop
    // on a node that also has a real edge — both impls must agree on the
    // full (node, cluster_id, cluster_size) contract.
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 2L)).toDF("id_a", "id_b")
    val exp = Set((1L, 1L, 2L), (2L, 1L, 2L), (5L, 5L, 1L))
    val prop = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    val star = Dedup.connectedComponentsBigStar(edges, "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(prop == exp)
    assert(star == exp)
  }

  test("CC reliable-checkpoint path produces identical output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val edges = (0L until 9L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val exp = (0L until 10L).map(n => (n, 0L, 10L)).toSet
    val prop = Dedup.connectedComponents(edges, "id_a", "id_b",
      checkpointDir = Some(dir)).as[(Long, Long, Long)].collect().toSet
    val star = Dedup.connectedComponentsBigStar(edges, "id_a", "id_b",
      checkpointDir = Some(dir)).as[(Long, Long, Long)].collect().toSet
    assert(prop == exp)
    assert(star == exp)
  }

  test("connectedComponents: long chain converges (diameter-bounded rounds)") {
    // path 0-1-2-...-9: worst case for label propagation — min label must
    // travel the full diameter; also the min sits at one END of the chain.
    val edges = (0L until 9L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 10)
    assert(out.forall { case (_, cid, sz) => cid == 0L && sz == 10L })
  }

  test("connectedComponentsBigStar equals min-label propagation on varied graph shapes") {
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      // long chain (worst case for propagation, the big-star motivation)
      (0L until 30L).map(i => (i, i + 1)),
      // clique on 8 nodes
      (for { i <- 0 until 8; j <- (i + 1) until 8 } yield (i.toLong, j.toLong)).toSeq,
      // star whose CENTER is not the minimum (min is a leaf)
      Seq(50L -> 10L, 50L -> 60L, 50L -> 70L, 50L -> 80L),
      // two components + a bridge-less extra pair, ids descending
      Seq(9L -> 7L, 7L -> 5L, 100L -> 90L, 90L -> 95L, 3L -> 2L),
      // pseudo-random graph, fixed arithmetic generator
      (0 until 60).map(i => ((i * 37 + 11) % 40).toLong -> ((i * 53 + 29) % 40).toLong)
        .filter(p => p._1 != p._2))
    graphs.zipWithIndex.foreach { case (g, gi) =>
      val edges = g.toDF("id_a", "id_b")
      // propagation needs O(diameter) rounds — raise its cap for the chain;
      // big-star keeps its default (the point of the comparison)
      val prop = Dedup.connectedComponents(edges, "id_a", "id_b", maxIter = 40)
        .as[(Long, Long, Long)].collect().toSet
      val star = Dedup.connectedComponentsBigStar(edges, "id_a", "id_b")
        .as[(Long, Long, Long)].collect().toSet
      assert(star == prop, s"graph #$gi: big-star != propagation")
    }
  }

  test("connectedComponents on minhash pairs groups every pair's endpoints together") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9).cache()
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    // every edge endpoint got a cluster, and both endpoints share it
    val lab = cc.select(col("node"), col("cluster_id"))
    val broken = pairs
      .join(lab.select(col("node").as("id_a"), col("cluster_id").as("ca")), "id_a")
      .join(lab.select(col("node").as("id_b"), col("cluster_id").as("cb")), "id_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(broken == 0)
    // cluster id is a member of its own cluster
    val selfish = cc.filter(col("node") === col("cluster_id")).count()
    val nClusters = cc.select(col("cluster_id")).distinct().count()
    assert(selfish == nClusters)
  }
}
