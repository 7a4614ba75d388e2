package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text analysis + multimodal plumbing behavior. */
class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("q44 decomposition is self-consistent: aggregate == sums == re-aggregated survivors") {
    // The bisect contract: if any one of q44/q44a/q44b ever drifts from
    // the others, the decomposition argument (README §Verification) is
    // void — pin their mutual consistency, not just each oracle match.
    val sf = "/root/testdata/sf0.001"
    val q44 = graft.SparkEntry.queries("q44_curation")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val sums = graft.SparkEntry.queries("q44a_curation_sums")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val fromSurvivors = graft.SparkEntry.queries("q44b_curation_survivors")(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique"), sum(col("group_size")).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"), sum(col("q_mu")).as("sum_q_mu"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(sums.keySet == q44.keySet && fromSurvivors == sums)
    q44.foreach { case (lang, (_, nu, nd, st, avgMu)) =>
      val (_, nuA, ndA, stA, sq) = sums(lang)
      assert((nu, nd, st) == ((nuA, ndA, stA)))
      assert(avgMu == (sq * 2 + nuA) / (nuA * 2), s"round-half-up mismatch for $lang")
    }
  }

  test("chunkDedup: non-vacuous, bounded, and kept_fp matches a driver-side reassembly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.chunkDedup(docs, "doc_id", "text", k = 3, minDocs = 3)
      .cache()
    assert(out.filter(col("n_dropped") > col("n_chunks")).count() == 0)
    assert(out.filter(col("n_dropped") > 0).count() > 0, "boilerplate pass is vacuous")
    // a doc with NOTHING dropped fingerprints its full chunk stream —
    // recompute one independently (plain JVM string ops, no Spark)
    val clean = out.filter(col("n_dropped") === 0)
      .select(col("doc_id"), col("kept_fp")).as[(Long, String)].head()
    val text = docs.filter(col("doc_id") === clean._1)
      .select(col("text")).as[String].head()
    val ws = text.trim.toLowerCase.split("\\s+")
    val expected = ws.grouped(3).filter(_.length == 3).map(_.mkString(" "))
      .mkString(" ")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(clean._2 == fp, s"kept_fp mismatch for doc ${clean._1}")
    out.unpersist()
  }

  test("word/token counts and ratios") {
    val df = Seq("The quick, brown fox! It is fast.").toDF("text")
    val r = df.select(
      TextAnalysis.wordCount(col("text")),
      TextAnalysis.tokenCount(col("text")),
      round(TextAnalysis.punctRatio(col("text")), 4),
      round(TextAnalysis.stopwordRatio(col("text"), "en"), 4)).head()
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == 10) // 7 words + , ! .
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 0.2)
    assert(r.getDouble(3) > 0) // "the", "it", "is"
  }

  test("langId picks the dominant stopword list; 'und' when no hits") {
    val df = Seq(
      "the cat is on the mat and it is fine",
      "el gato es un animal y la casa es de juan",
      "der hund und die katze sind mit dem ball",
      "zzz qqq xxx").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("quality score in [0,1] and monotone in diversity") {
    val df = Seq("a a a a a a a a a a", "the quick brown fox jumps over lazy dogs")
      .toDF("text")
    val q = df.select(TextAnalysis.qualityScore(col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0 && v <= 1))
    assert(q(1) > q(0))
  }

  test("fingerprints are normalization-invariant") {
    val df = Seq(("Hello  World", "  hello world ")).toDF("a", "b")
    val r = df.select(
      TextAnalysis.fingerprintMd5(col("a")) === TextAnalysis.fingerprintMd5(col("b")),
      TextAnalysis.fingerprint64(col("a")) === TextAnalysis.fingerprint64(col("b"))).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("multimodal: meta extraction prunes payload; decode stub is deterministic") {
    val df = Seq(("doc1", "some fake media bytes")).toDF("id", "text")
    val media = Multimodal.withMedia(df, col("text").cast("binary"), "application/octet-stream")
    val meta = media.select(col("media.meta.mime"), col("media.meta.size_bytes")).head()
    assert(meta.getString(0) == "application/octet-stream")
    assert(meta.getInt(1) == "some fake media bytes".length)

    val payload = media.select(col("id"), col("media.payload").as("payload"))
    val d1 = Multimodal.decodeStub(payload, "payload")
      .select("features.width", "features.height", "features.n_frames").head()
    val d2 = Multimodal.decodeStub(payload, "payload")
      .select("features.width", "features.height", "features.n_frames").head()
    assert(d1 == d2)
    assert(d1.getInt(0) >= 16 && d1.getInt(0) < 32)
  }

  test("sampleBytes slices byte ranges") {
    val df = Seq("abcdefghij").toDF("text")
    val out = df.select(
      Multimodal.sampleBytes(col("text").cast("binary"), 2, 3).cast("string")).head()
    assert(out.getString(0) == "cde")
  }

  test("winnowing: shared >= k+w-1 word run shares a fingerprint; disjoint texts share none") {
    val k = 3; val w = 4
    val run = "alpha bravo charlie delta echo foxtrot golf" // k+w-1 = 6 < 7 words
    val docs = Seq(
      ("a", s"unrelated prefix words here $run and then a suffix"),
      ("b", s"$run totally different continuation of the second document"),
      ("c", "no overlap with anything else whatsoever in this text at all"))
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .select(col("doc_id"), TextAnalysis.gramHashes(col("ws"), k).as("hs"))
      .select(col("doc_id"), TextAnalysis.winnow(col("hs"), w).as("fps"))
      .as[(String, Seq[Long])].collect().toMap
    assert(fps("a").intersect(fps("b")).nonEmpty,
      s"shared run must share a fingerprint: ${fps("a")} vs ${fps("b")}")
    assert(fps("a").intersect(fps("c")).isEmpty)
    assert(fps("b").intersect(fps("c")).isEmpty)
    // ~1/w selectivity: far fewer fingerprints than grams
    val nGrams = docs.select(size(TextAnalysis.gramHashes(
      Dedup.words(col("text")), k))).as[Int].collect()
    assert(fps.values.map(_.size).sum < nGrams.sum)
  }

  test("maxRunLengthW: consecutive runs; mode count via sorted runs") {
    val df = Seq(
      (1L, Seq("a", "a", "b", "a", "a", "a", "c")), // longest run 3; mode "a" x5
      (2L, Seq("x")),
      (3L, Seq.empty[String]))
      .toDF("id", "arr")
      .withColumn("sorted", array_sort(col("arr")))
    val r = df.select(col("id"), TextAnalysis.maxRunLengthW(col("arr")),
        TextAnalysis.maxRunLengthW(col("sorted")))
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 3, 5)))
    assert(r(1) == ((2L, 1, 1)))
    assert(r(2) == ((3L, 0, 0)))
  }

  test("winnowPostings drops corpus-wide boilerplate fingerprints, keeps genuine overlaps") {
    // The crawl-corpus skew case: a license-header run shared by 60
    // documents. Uncapped, its fingerprints produce C(60,2) boilerplate
    // pairs; the stop-fingerprint guard drops them while a genuine 20-word
    // shared run between two documents keeps its pairs.
    val boiler = "copyright acme corporation all rights reserved this file is " +
      "published under the standard demonstration license and may be copied " +
      "freely provided this notice remains intact in every redistribution"
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs =
      (0 until 60).map(i => (i.toLong, s"$boiler uniq${i}a uniq${i}b uniq${i}c")) ++
        Seq((1000L, s"first document distinct opening words $run"),
            (1001L, s"a completely different second prologue $run"))
    val df = docs.toDF("doc_id", "text")

    def pairsOf(posts: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      posts.select(col("fp"), col("doc_id").as("id_a"))
        .join(posts.select(col("fp").as("fp_b"), col("doc_id").as("id_b")),
          col("fp") === col("fp_b") && col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val capped = TextAnalysis.winnowPostings(df, "doc_id", "text",
      k = 3, w = 4, maxDocsPerFp = 10)
    // no surviving fingerprint exceeds the cap
    val maxDocs = capped.groupBy("fp").count().agg(max("count")).head().getLong(0)
    assert(maxDocs <= 10, s"fp above cap survived: $maxDocs docs")
    // boilerplate pairs are gone; the genuine overlap is the only pair
    assert(pairsOf(capped) == Set((1000L, 1001L)))

    val uncapped = TextAnalysis.winnowPostings(df, "doc_id", "text",
      k = 3, w = 4, maxDocsPerFp = Int.MaxValue)
    // without the guard the same join drowns in m² boilerplate pairs
    assert(pairsOf(uncapped).size > 1000)
  }

  test("chunkPassages: window/stride geometry, short docs, boundary cases") {
    def wordsDoc(id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "))
    // 10 words @ window 4 stride 3: chunks start at 0,3,6 — the start-6
    // chunk reaches the end, so no start-9 chunk is emitted
    val df = Seq(wordsDoc(1, 10), wordsDoc(2, 4), wordsDoc(3, 1),
      wordsDoc(4, 5)).toDF("doc_id", "text")
    val out = TextAnalysis.chunkPassages(df, "doc_id", "text", window = 4, stride = 3)
      .select(col("doc_id"), col("chunk_id"), col("n_words"))
      .as[(Long, Int, Int)].collect().toSet
    assert(out == Set(
      (1L, 0, 4), (1L, 1, 4), (1L, 2, 4), // 10 words: [0..3][3..6][6..9]
      (2L, 0, 4),                         // exactly one window
      (3L, 0, 1),                         // short doc: whole text, one chunk
      (4L, 0, 4), (4L, 1, 2)))            // last chunk short but reaches end
  }

  test("binaryFile ingest round-trips payload bytes; metadata projection prunes content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binfile").toString
    val docs = Seq((7L, "hello payload"), (13L, "café bytes"), (-3L, "neg id"))
      .toDF("doc_id", "text")
    Multimodal.exportPayloads(docs, "doc_id", col("text").cast("binary"), dir)
    // re-export over the same dir must REPLACE files (the tmp+rename path
    // deletes a stale destination before the atomic rename lands)
    Multimodal.exportPayloads(docs, "doc_id", col("text").cast("binary"), dir)
    // a crashed attempt's orphan tmp must be invisible behind the glob
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "7.bin.99.tmp"),
      "torn".getBytes("UTF-8"))
    val back = Multimodal.readPayloadDir(spark, dir, glob = Some("*.bin"))
      .select(
        regexp_extract(col("path"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length"), col("content"))
    val rows = back.as[(Long, Long, Array[Byte])].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(7L, 13L, -3L))
    assert(new String(rows(7L)._3, "UTF-8") == "hello payload")
    // byte length, not char length: 'café bytes' is 10 chars, 11 UTF-8 bytes
    assert(rows(13L)._2 == 11L && rows(13L)._3.length == 11)
    // the sign survives the path round trip
    assert(new String(rows(-3L)._3, "UTF-8") == "neg id")
    // the scale contract: a metadata-only projection must not read payloads
    val metaPlan = Multimodal.readPayloadDir(spark, dir)
      .select(col("path"), col("length"))
      .queryExecution.executedPlan.toString
    val readSchema = metaPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse(metaPlan)
    assert(!readSchema.contains("content"),
      "binaryFile scan reads payload bytes for a metadata projection:\n" + readSchema)
  }

  test("payload shards: size-capped tar round trip, rolls at the cap, tmps invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    // ~30-byte payloads against a 64-byte cap: every shard rolls after two
    // entries, so the cap boundary and multi-shard listing are exercised
    val docs = (1L to 9L).map(i => (i, s"payload-$i-" + ("x" * 20)))
      .toDF("doc_id", "text").coalesce(2)
    Multimodal.exportPayloadShards(docs, "doc_id", col("text").cast("binary"),
      dir, maxShardBytes = 64L)
    // drop the local-FS checksum sidecars (.crc) — hidden files, which
    // the binaryFile listing skips anyway
    val listed = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(listed.forall(f => f.endsWith(".tar") || f.endsWith(".tar.manifest") ||
      f == graft.sources.shardsource.ShardAggManifest.FileName ||
      f == graft.sources.shardsource.ShardListingManifest.FileName),
      s"non-tar debris: $listed")
    val shards = listed.filter(_.endsWith(".tar"))
    assert(shards.size >= 3, s"cap never rolled a shard: $shards")
    // every committed shard carries its entry-manifest sidecar
    assert(shards.forall(s => listed.contains(s + ".manifest")), listed)
    // an orphan tmp from a crashed attempt must not surface as entries
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00009-00000.tar.7.tmp"),
      "torn".getBytes("UTF-8"))
    val back = Multimodal.readPayloadShards(spark, dir)
      .select(regexp_extract(col("name"), "(-?[0-9]+)\\.bin$", 1).cast("long"),
        col("content").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(back.keySet == (1L to 9L).toSet)
    (1L to 9L).foreach(i => assert(back(i) == s"payload-$i-" + ("x" * 20)))
    // a single payload larger than the cap still lands (its own shard)
    val big = Seq((100L, "y" * 500)).toDF("doc_id", "text").coalesce(1)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Multimodal.exportPayloadShards(big, "doc_id", col("text").cast("binary"),
      dir2, maxShardBytes = 64L)
    val one = Multimodal.readPayloadShards(spark, dir2)
      .select(col("content").cast("string")).as[String].collect().toSeq
    assert(one == Seq("y" * 500))
  }

  test("payload shards: arbitrary binary payloads round-trip under random caps") {
    // deterministic pseudo-random corpus: empty payloads, payloads above
    // the cap, non-UTF8 bytes — the shard framing must be content-blind
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val cap = 1L << (4 + rnd.nextInt(6)) // 16 B .. 512 B
      val docs = (0 until 20).map { i =>
        val len = rnd.nextInt(4) match {
          case 0 => 0                           // empty entry
          case 1 => rnd.nextInt(8)              // tiny
          case 2 => rnd.nextInt(64)             // around the cap
          case _ => 64 + rnd.nextInt(600)       // multiples of the cap
        }
        val b = new Array[Byte](len); rnd.nextBytes(b)
        (i.toLong, b)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-shprop$round").toString
      val df = docs.toDF("doc_id", "payload").repartition(3)
      Multimodal.exportPayloadShards(df, "doc_id", col("payload"), dir,
        maxShardBytes = cap)
      val back = Multimodal.readPayloadShards(spark, dir)
        .select(regexp_extract(col("name"), "(-?[0-9]+)\\.bin$", 1).cast("long"),
          col("content"))
        .as[(Long, Array[Byte])].collect().toMap
      assert(back.keySet == docs.map(_._1).toSet,
        s"round $round cap $cap: lost/invented entries")
      docs.foreach { case (id, bytes) =>
        assert(java.util.Arrays.equals(back(id), bytes),
          s"round $round cap $cap: payload $id corrupted")
      }
    }
  }

  test("frameSample: zero-length payload emits no frames") {
    val df = Seq((1L, "")).toDF("id", "text")
    val n = df.select(col("id"), col("text").cast("binary").as("p"))
      .select(size(Multimodal.frameSample(col("p"), 16, 48))).as[Int].head()
    assert(n == 0)
  }

  test("frameSample: strided geometry never emits a frame starting past the payload") {
    // stride > frameSize leaves gaps; a payload ending inside a gap must
    // not produce a phantom empty frame (len=96 @ fs=16, st=48: frames at
    // 0 and 48 only — offset 96 is past the end)
    val cases = Seq(1, 15, 16, 17, 47, 48, 49, 63, 64, 65, 95, 96, 97, 144, 145)
    val df = cases.zipWithIndex
      .map { case (n, id) => (id.toLong, "x" * n) }.toDF("id", "text")
    val out = df.select(col("id"), col("text").cast("binary").as("p"))
      .select(col("id"), posexplode(Multimodal.frameSample(col("p"), 16, 48)))
      .select(col("id"), col("pos"), length(col("col")).as("flen"))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    cases.zipWithIndex.foreach { case (n, id) =>
      val expStarts = Iterator.from(0, 48).takeWhile { s =>
        s < n && (s == 0 || s - 48 + 16 < n)
      }.toSeq
      val exp = expStarts.map(s => math.min(16, n - s))
      assert(out(id.toLong) == exp, s"len=$n")
      assert(out(id.toLong).forall(_ > 0), s"len=$n emitted an empty frame")
    }
  }

  test("chunkPassages matches a sequential reference over random doc lengths") {
    // plain-Scala restatement of the geometry: starts advance by stride
    // until a window reaches the end; chunks are word slices
    def reference(words: Seq[String], window: Int, stride: Int): Seq[(Int, Int)] = {
      val n = words.length
      val nc = 1 + math.ceil(math.max(0, n - window).toDouble / stride).toInt
      (0 until nc).map { i =>
        val chunk = words.slice(i * stride, i * stride + window)
        (i, chunk.length)
      }
    }
    // deterministic pseudo-random lengths incl. the boundary cases around
    // multiples of stride and window
    val lengths = Seq(1, 2, 7, 8, 9, 15, 16, 17, 24, 31, 32, 33, 40, 47, 48, 49, 96) ++
      (0 until 20).map(i => 1 + (i * 37 + 11) % 120)
    val docs = lengths.zipWithIndex
      .map { case (n, id) => (id.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.chunkPassages(df, "doc_id", "text", window = 16, stride = 8)
      .select(col("doc_id"), col("chunk_id"), col("n_words"))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    docs.foreach { case (id, text) =>
      val exp = reference(text.split(" ").toSeq, 16, 8)
      assert(out(id) == exp, s"doc $id (${text.split(' ').length} words)")
    }
  }

  test("packSequences matches a sequential reference packing per shard") {
    val docs = (1L to 150L).map(i => (i, ("tok " * (1 + (i % 13)).toInt).trim))
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(df, "doc_id", "text", budget = 40, shards = 4)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("pack_id"), col("offset"))
      .as[(Long, Long, Int, Long, Long)].collect()
    // reference: group by the same md5 shard, order by (md5 hex, id),
    // stream-pack with a running token counter
    def md5hex(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def shardOf(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id).take(15), 16) % 4
    val byShard = docs.map { case (id, text) =>
      (id, shardOf(id), text.split(" ").length)
    }.groupBy(_._2)
    val expected = byShard.flatMap { case (shard, rows) =>
      var cum = 0L
      rows.sortBy { case (id, _, _) => (md5hex(id), id) }.map { case (id, _, nt) =>
        val before = cum
        cum += nt
        (id, shard, nt, before / 40, before % 40)
      }
    }.toSet
    assert(out.toSet == expected)
  }

  test("packSequences: packs fill to the budget; offsets are cumulative within shard") {
    val df = (1L to 200L).map(i => (i, "tok " * 10)).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(df, "doc_id", "text", budget = 64, shards = 4)
    import org.apache.spark.sql.Row
    // every doc's offset is its shard-cumsum mod nothing: offset < budget
    assert(out.filter(col("offset") >= 64 || col("offset") < 0).count() == 0)
    // within a (shard, pack), offsets + n_tokens never exceed budget except
    // for the boundary-straddling first doc of the NEXT pack — i.e. each
    // pack's docs start strictly inside the budget
    val rows = out.collect()
    rows.foreach { case Row(_, _, _, _, off: Long) => assert(off < 64) }
    // conservation: total tokens = sum over shards of last cum value;
    // every doc appears exactly once
    assert(out.count() == 200)
    assert(out.select(sum(col("n_tokens"))).head().getLong(0) == 200 * 10)
  }
}
