package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants are designed for the 100 TB shuffle story:
  *  - EXACT dedup shuffles once on a 128-bit content hash (not the raw
  *    text), so the exchange carries 16-byte keys instead of documents;
  *  - MINHASH-LSH near-dup generates candidates by BAND BUCKETS — the only
  *    shuffle is on (band, bandHash); no all-pairs product ever exists.
  *    Candidate verification joins shingle sets only for colliding pairs;
  *  - SIMHASH is a single map-side pass producing a 64-bit signature;
  *    near-dup candidates bucket on rotated prefixes;
  *  - n-gram JACCARD pairs are computed only WITHIN a blocking key (here
  *    `lang`) — the blocked self-join is the documented brute-force
  *    baseline, bounded by the largest block, not the corpus.
  *
  * Everything is native Catalyst (split/transform/aggregate/xxhash64) —
  * no UDFs, codegen-friendly, and deterministic (fixed hash seeds).
  */
object Dedup {

  /** Normalized word array of a text column. */
  def words(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Normalized content fingerprint: md5 of the lower-cased,
    * whitespace-collapsed first `prefixWords` words (full text when 0).
    */
  def contentKey(text: Column, prefixWords: Int = 0): Column = {
    val ws = words(text)
    val base = if (prefixWords > 0) slice(ws, 1, prefixWords) else ws
    md5(concat_ws(" ", base).cast("binary"))
  }

  /** 60-bit integer from the first 15 md5 hex chars of a value's string
    * form — THE engine-independent bucketing scheme shared by split
    * assignment (q57/q76), pack sharding, and the stratified-sample rank:
    * any engine with md5 recomputes it bit-for-bit, so every consumer
    * stays oracle-checkable, and a change here changes them all together.
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Exact dedup: keep the row with the minimal `tieBreak` per content key.
    * One shuffle on the 128-bit key; map-side partial min. Equivalent to
    * the reference user's drop-duplicates-by-hash pattern at any scale.
    *
    * Implemented as a single `min_by` aggregation: the full row travels as
    * PAYLOAD (so non-orderable columns — maps — are carried, not compared)
    * and the ORDERING key is a struct of (tieBreak-is-null, tieBreak, the
    * orderable columns). Rows with a NULL `tieBreak` therefore lose to any
    * non-NULL row (matching `min(tieBreak)`'s NULL-ignoring semantics), and
    * the orderable columns break residual ties, so the survivor is
    * deterministic whenever duplicate tie-break rows differ in at least one
    * orderable column. (Rows identical in the tie-break AND every orderable
    * column but differing in a map column: survivor is any one of them.)
    * A join-back formulation is both a second shuffle and, derived from the
    * same plan, resolves the key columns ambiguously (a trivially-true
    * self-equality).
    */
  def exactDedup(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val cols = df.columns.toSeq
    val orderable = df.schema.fields
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(_.name).toSeq
    val ordering = struct(
      tieBreak.isNull.as("__tbnull") +: tieBreak.as("__tb") +:
        orderable.zipWithIndex.map { case (c, i) => col(c).as(s"__o$i") }: _*)
    df.withColumn("__key", key)
      .groupBy(col("__key"))
      .agg(
        min_by(struct(cols.map(col): _*), ordering).as("__best"),
        count(lit(1)).as("group_size"))
      .select(cols.map(c => col(s"__best.$c")) ++
        Seq(col("__key").as("content_key"), col("group_size")): _*)
  }

  /** Word k-shingles (distinct). `transform` over an index sequence is the
    * native sliding window — no explode, no shuffle.
    *
    * CAUTION (hot paths): the lambda references `ws`, and a lambda that
    * closes over a non-trivial outer expression re-evaluates it PER ARRAY
    * ELEMENT (measured 5× on the bigram query) — so this form is for
    * tests/small data. The production dedup paths shingle inside the fused
    * codegen'd expressions ([[graft.expr.MinHashShingles]],
    * [[graft.expr.ShingleHashSet]]), which walk the word array once.
    */
  def shingles(text: Column, k: Int): Column = {
    val ws = words(text)
    array_distinct(
      when(size(ws) >= k,
        transform(sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", slice(ws, i + lit(1), lit(k)))))
        .otherwise(array(concat_ws(" ", ws))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum seeded xxhash64 over the shingle set — the native codegen'd
    * [[graft.expr.MinHashSignature]] (a HOF fold here is interpreted and
    * allocates two accumulator arrays per shingle).
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.expr.MinHashSignature(shingleCol, numHashes)

  /** LSH band buckets: signature split into `bands` bands of `rowsPerBand`,
    * each hashed to one bucket id struct (band, hash).
    */
  def bandBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Jaccard with precomputed set sizes: |∪| = |a| + |b| − |∩|, so only
    * the intersection size is computed — via the zero-allocation merge
    * scan [[graft.expr.SortedIntersectSize]] (both sides MUST be sorted,
    * which the operators do once per row in their enrichment stage;
    * `size(array_intersect(...))` builds a boxed hash set per pair).
    */
  def jaccardWithSizes(aSorted: Column, bSorted: Column, na: Column, nb: Column): Column = {
    val i = graft.expr.SortedIntersectSize(aSorted, bSorted).cast("double")
    i / (na.cast("double") + nb.cast("double") - i)
  }

  private val observeSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Salt LSH band buckets into chunks of ≤ `maxBucketSize`, with the
    * oversized mass counted into a named observation (no silent cap).
    * Input carries (id, b) with `b.band` the band index; output is
    * (bk, id) where bk = (b, chunk) is the salted join key. ONE
    * implementation shared by [[minhashPairs]] and
    * [[graft.scale.Similarity.cosineNearDupPairs]] — both Scaladocs
    * promise "exactly the same salting", so the scheme must not drift.
    * The chunk split caps the per-bucket pair product at the cost of
    * missing cross-chunk pairs inside a pathological bucket; buckets
    * under the cap get `ceil(bs/max) = 1` chunk — the identity.
    */
  private[scale] def saltedBucketKeys(buckets: DataFrame, metricPrefix: String,
                                      maxBucketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = observeSeq.incrementAndGet()
    buckets
      .withColumn("bs", count(lit(1)).over(Window.partitionBy(col("b"))))
      .observe(s"${metricPrefix}_$seq",
        sum(when(col("bs") > maxBucketSize, 1L).otherwise(0L)).as("oversized_bucket_rows"))
      .filter(col("bs") >= 2)
      .withColumn("chunk",
        pmod(xxhash64(col("id"), col("b.band")), ceil(col("bs") / maxBucketSize)).cast("int"))
      .select(struct(col("b"), col("chunk")).as("bk"), col("id"))
  }

  /** Signature-agreement slack below the Jaccard threshold for the LSH
    * candidate prefilter: E[agreement] = J, so `threshold − slack` keeps
    * recall while pruning most candidates on the compact signatures. ONE
    * constant shared by [[minhashPairs]] and [[probeMinhashIndex]] — the
    * recompute world and the index world must stay tuned together or
    * their shared-oracle contract (q75 ≡ q81) silently diverges.
    */
  private val sigAgreementSlack = 0.15

  /** Clone collapse: one deterministic representative per content key —
    * min (id, text), id leading the ordering. Expects (ck, id, text);
    * keeps ck so callers that expand back over clones can join on it.
    */
  private def repCollapse(docs: DataFrame): DataFrame =
    docs.groupBy(col("ck"))
      .agg(min(struct(col("id"), col("text"))).as("m"))
      .select(col("ck"), col("m.id").as("id"), col("m.text").as("text"))

  /** Sorted shingle-hash sets for exactly the ids in `ids` (semi-join:
    * candidate-sized, never corpus-wide), repartitioned to spread the
    * per-doc work. Expects (id, text); emits (id, sh, n).
    */
  private def shingleSets(docs: DataFrame, ids: DataFrame, shingleK: Int,
                          parts: Int): DataFrame =
    docs.join(ids, Seq("id"), "left_semi")
      .repartition(parts)
      .select(col("id"),
        graft.expr.ShingleHashSet(words(col("text")), shingleK).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * per-side (id, sh, n) shingle sets: size-ratio prefilter (J can never
    * exceed min|.|/max|.| — two int ops kill most candidates before any
    * merge scan), then [[jaccardWithSizes]]' zero-allocation intersect.
    * The single verify stage behind both [[minhashPairs]] and
    * [[probeMinhashIndex]].
    */
  private def verifyJaccard(pairs: DataFrame, aSets: DataFrame,
                            bSets: DataFrame, threshold: Double): DataFrame =
    pairs
      .join(aSets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a")), "id_a")
      .join(bSets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b")), "id_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .withColumn("sim", jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))

  /** MinHash-LSH near-duplicate pairs: band-bucket candidate generation,
    * exact-Jaccard verification at `threshold` (Jaccard over 64-bit
    * shingle hashes — equal to string-shingle Jaccard up to ~n²/2⁶⁵
    * collisions per pair). Returns (id_a, id_b, sim) with id_a < id_b.
    *
    * Scale shape, in order:
    *  1. EXACT-DUPLICATE COLLAPSE — identical normalized content has
    *     identical shingle sets, so clone pairs are emitted directly as
    *     sim=1.0 (an equi-join on the 16-byte content key, linear in
    *     output) and only UNIQUE contents enter the LSH. Without this,
    *     every band of an m-clone cluster emits m(m−1)/2 candidates ×
    *     bands — quadratic blow-up on exactly the corpora (crawl dumps)
    *     near-dup exists for.
    *  2. SIGNATURES over unique contents via the fused
    *     [[graft.expr.MinHashShingles]] (one string hash per word, cheap
    *     derived hash family — no shingle strings materialize). The
    *     corpus is explicitly repartitioned BEFORE this projection: at
    *     small inputs AQE coalesces the collapse group-by output to few
    *     partitions and the per-doc work would otherwise run serially.
    *  3. BAND BUCKETS: one window shuffle counts each bucket's size, then
    *     a self-equi-join on the bucket key emits candidate pairs.
    *     Buckets larger than `maxBucketSize` are NOT dropped — members
    *     are salted into ceil(size/maxBucketSize) chunks (per-band salt,
    *     so different bands chunk a mega-cluster differently) and pairs
    *     form within chunks. A size-m mega-bucket therefore costs
    *     O(m·maxBucketSize) instead of O(m²), and a true pair in an
    *     m-member near-dup cluster keeps ≈ 1−(1−1/c)^bands chance of
    *     co-chunking (c = chunks/bucket) instead of falling off the
    *     dropped-bucket cliff. The affected row count is published via
    *     `observe` ("minhash_lsh_<n>": oversized_bucket_rows — the metric
    *     name carries a sequence number so composing several
    *     differently-parameterized calls in one query stays analyzable).
    *  4. Two-stage verification: compact-signature agreement estimate
    *     (threshold − [[sigAgreementSlack]] margin) prunes candidates
    *     first; then shingle
    *     HASH SETS are built ONLY for ids that survive (never
    *     corpus-wide) and exact Jaccard with the size-ratio bound
    *     decides.
    *  5. EXPANSION — verified unique-content pairs are mapped back to all
    *     clone-cluster members (two equi-joins, linear in output size).
    *
    * Shuffles: collapse group-by, signature repartition (reused by all
    * three signature consumers), bucket window, verify joins, expansion
    * joins — all on keys, never all-pairs, no quadratic blow-up on
    * duplicate-heavy buckets.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 48, bands: Int = 6,
                   threshold: Double = 0.9, maxBucketSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rowsPerBand = numHashes / bands
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    val docs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("ck", contentKey(col("text")))
    val members = docs.select(col("ck"), col("id"))
    // 1a. clone pairs: same normalized content ⇒ Jaccard exactly 1.0
    val intra = members.select(col("ck"), col("id").as("id_a"))
      .join(members.select(col("ck").as("ck_b"), col("id").as("id_b")),
        col("ck") === col("ck_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("sim"))
    // 1b. unique contents (deterministic representative: min (id, text))
    val uniq = repCollapse(docs).drop("ck")
    // 2. signatures: repartition FIRST (spread the per-doc work), then one
    // fused projection. All three consumers (bucket explode + two probe
    // sides) share the byte-identical exchange subtree, so ReuseExchange
    // computes the signatures exactly once.
    val sigs = uniq.repartition(parts)
      .select(col("id"),
        graft.expr.MinHashShingles(words(col("text")), shingleK, numHashes).as("sig"))
    // 3. band buckets: one window shuffle for bucket sizes; oversized
    // buckets are salted into chunks of ≤ maxBucketSize (see Scaladoc).
    val kept = saltedBucketKeys(
      sigs.select(col("id"), explode(bandBuckets(col("sig"), bands, rowsPerBand)).as("b")),
      "minhash_lsh", maxBucketSize)
    val cand = kept.select(col("bk").as("lb"), col("id").as("id_a"))
      .join(kept.select(col("bk").as("rb"), col("id").as("id_b")),
        col("lb") === col("rb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // 4a. signature-agreement prefilter: E[agreement] = J, so
    // threshold − sigAgreementSlack keeps recall while pruning most
    // candidates on the compact signatures (numHashes longs/row).
    val estimated = cand
      .repartition(parts) // even spread of the verify work (see blockedJaccardPairs)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(graft.expr.SigAgreement(col("sig_a"), col("sig_b")) >= threshold - sigAgreementSlack)
      .select(col("id_a"), col("id_b"))
    // 4b. exact verify: shingle hash sets ONLY for surviving candidate ids
    // (semi-join back to the unique contents), then the merge-scan
    // intersect. The candidate set is orders of magnitude smaller than
    // the corpus, so the corpus-wide sorted-set materialization the old
    // formulation did is gone.
    val candIds = estimated.select(col("id_a").as("id"))
      .unionAll(estimated.select(col("id_b").as("id"))).distinct()
    val vsets = shingleSets(uniq, candIds, shingleK, parts)
    val repPairs = verifyJaccard(estimated, vsets, vsets, threshold)
    // 5. expand representative pairs back to every clone-cluster member on
    // both sides (identical content ⇒ identical Jaccard to anything).
    // representative id per content key = min(id) (matches uniq's
    // min(struct(id, text)) since id leads the ordering); derived from the
    // narrow (ck, id) projection, not the text-carrying uniq.
    val ckOf = members.groupBy(col("ck")).agg(min(col("id")).as("id"))
    val expanded = repPairs
      .join(ckOf.select(col("id").as("id_a"), col("ck").as("ck_a")), "id_a")
      .join(ckOf.select(col("id").as("id_b"), col("ck").as("ck_b")), "id_b")
      .join(members.select(col("ck").as("ck_a"), col("id").as("ma")), "ck_a")
      .join(members.select(col("ck").as("ck_b"), col("id").as("mb")), "ck_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("sim"))
    expanded.unionAll(intra)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Persisted-LSH index build — the amortized half of the incremental
    * ingestion contract. Running [[minhashPairs]] over `corpus ∪ batch`
    * is correct but O(corpus) on EVERY increment; the production shape
    * for daily ingestion at 100 TB is O(batch): pay the corpus signature
    * pass ONCE, persist its LSH artifacts BUCKETED on their join keys
    * ([[graft.sources.Sources.writeBucketed]]), and let every batch probe
    * ([[probeMinhashIndex]]) equi-join them with zero corpus-side compute
    * and zero corpus-side shuffle — the bucketed layout co-locates the
    * index on the join key at write time, so only the O(batch) probe side
    * exchanges. The reference's backfill idiom
    * (`DateRanges.split_lookback_period`, date.py:907-956) exists to make
    * incremental runs cheap — this is its dedup analog.
    *
    * Three bucketed tables, all at the clone-collapsed representative
    * level (exact-duplicate contents share one min-id rep, exactly as
    * [[minhashPairs]] collapses them — near-dup relations are
    * content-level, so rep-level candidates lose nothing):
    *  - `<name>_keys`    (ck)               bucketed by ck: distinct
    *    corpus content keys — the exact-duplicate anti-join side;
    *  - `<name>_buckets` (bband, bhash, id) bucketed by bhash: band
    *    buckets of the rep signatures — the candidate equi-join;
    *  - `<name>_sigs`    (id, sig)          bucketed by id: rep
    *    signatures — the agreement-prefilter lookup.
    * A daily pipeline appends each batch's accepted reps to these tables
    * via [[appendToMinhashIndex]] so the index tracks the corpus
    * incrementally.
    */
  def buildMinhashIndex(corpus: DataFrame, idCol: String, textCol: String,
                        name: String, shingleK: Int = 3, numHashes: Int = 48,
                        bands: Int = 6, numBuckets: Int = 16): Unit = {
    val rowsPerBand = numHashes / bands
    val docs = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("ck", contentKey(col("text")))
    val uniq = repCollapse(docs).drop("ck")
    // signatures feed two writes — persist so the corpus pass runs once
    val sigs = uniq.select(col("id"),
      graft.expr.MinHashShingles(words(col("text")), shingleK, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.sources.Sources.writeBucketed(
        docs.select(col("ck")).distinct(), s"${name}_keys", Seq("ck"), numBuckets)
      graft.sources.Sources.writeBucketed(sigs, s"${name}_sigs", Seq("id"), numBuckets)
      graft.sources.Sources.writeBucketed(
        sigs.select(col("id"), explode(bandBuckets(col("sig"), bands, rowsPerBand)).as("b"))
          .select(col("b.band").as("bband"), col("b.bucket").as("bhash"), col("id")),
        s"${name}_buckets", Seq("bhash"), numBuckets)
    } finally sigs.unpersist()
  }

  /** Index maintenance — the repeated-increment half of the contract
    * ([[buildMinhashIndex]] pays the corpus pass once; this keeps the
    * index tracking the corpus at O(batch) per day, the same
    * repeated-increment economics as the reference's backfill idiom,
    * `DateRanges.split_lookback_period`, date.py:907-956). Appends the
    * ACCEPTED batch rows (the survivors [[probeMinhashIndex]] returned)
    * to the three bucketed tables with bucketed INSERTs — Spark validates
    * the bucket spec against the existing tables, so the co-located
    * equi-join layout survives every increment.
    *
    * Idempotent by construction: contents whose key is already stored are
    * anti-joined away first, so re-ingesting the same batch (a replayed
    * daily run) appends nothing. Clones within the batch collapse to one
    * min-id rep, exactly as the builder does — and since accepted rows
    * are never exact duplicates of indexed content, rep choice after
    * append equals rep choice after a full rebuild over corpus ∪ batch
    * (no content-key group ever spans the boundary), which is what makes
    * probe-after-append ≡ probe-after-rebuild (pinned by DedupSpec).
    *
    * CRASH RECOVERY: keys-last also makes a torn append self-healing. If
    * the job dies after signatures/buckets land but before the keys
    * write, a rerun's anti-join still sees the contents as fresh and
    * re-appends everything — the index converges, and the only artifact
    * of the torn state is duplicate signature/bucket rows, which cost
    * duplicate candidate work but cannot change any result (the probe's
    * dropped-set goes through `.distinct()` and verification is
    * content-level). Had keys gone FIRST, a crash would strand accepted
    * contents as exact-dup-detectable but never near-dup-detectable,
    * and the rerun would skip them forever. Pinned by DedupSpec's
    * torn-append test.
    *
    * CONTRACT: `accepted` must be MATERIALIZED rows (the corpus partition
    * the survivors were persisted to), not the live [[probeMinhashIndex]]
    * plan — that plan reads the very tables this call mutates, so lazy
    * re-evaluation after the first append would see the grown key set and
    * resolve to empty. A real pipeline lands the accepted rows in the
    * corpus store first and appends from there; in tests, collect or
    * write-and-read-back before appending.
    *
    * `params` must match the index build (same shingleK/numHashes/bands).
    */
  def appendToMinhashIndex(accepted: DataFrame, idCol: String, textCol: String,
                           name: String, shingleK: Int = 3, numHashes: Int = 48,
                           bands: Int = 6, numBuckets: Int = 16): Unit = {
    val spark = accepted.sparkSession
    val rowsPerBand = numHashes / bands
    val docs = accepted.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("ck", contentKey(col("text")))
    val fresh = docs.join(spark.table(s"${name}_keys"), Seq("ck"), "left_anti")
    val sigs = repCollapse(fresh)
      .select(col("ck"), col("id"),
        graft.expr.MinHashShingles(words(col("text")), shingleK, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Write order matters: every write re-executes this lazy plan, and
      // the plan anti-joins `_keys` — the first write materializes the
      // cache, and `_keys` goes LAST so any recompute still sees the
      // pre-append key set.
      graft.sources.Sources.writeBucketed(sigs.select(col("id"), col("sig")),
        s"${name}_sigs", Seq("id"), numBuckets, SaveMode.Append)
      graft.sources.Sources.writeBucketed(
        sigs.select(col("id"), explode(bandBuckets(col("sig"), bands, rowsPerBand)).as("b"))
          .select(col("b.band").as("bband"), col("b.bucket").as("bhash"), col("id")),
        s"${name}_buckets", Seq("bhash"), numBuckets, SaveMode.Append)
      graft.sources.Sources.writeBucketed(sigs.select(col("ck")).distinct(),
        s"${name}_keys", Seq("ck"), numBuckets, SaveMode.Append)
    } finally sigs.unpersist()
  }

  /** Compact the minhash index after many appends — the maintenance move
    * that completes [[appendToMinhashIndex]]'s story: each append adds
    * `numBuckets` files per table (after N days each bucket is N+1 files
    * every probe opens) and each torn-append recovery leaves duplicate
    * signature/bucket rows (harmless for results, paid for in candidate
    * work). One crash-safe bucketed rewrite per table
    * ([[graft.sources.Sources.compactTable]]: distinct → temp table →
    * swap) restores the one-file-per-bucket layout and drops the
    * duplicates; probe-after-compact ≡ probe-before is pinned by
    * DedupSpec. `numBuckets` must match the build.
    */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                          numBuckets: Int = 16): Seq[graft.sources.Sources.CompactStats] = Seq(
    graft.sources.Sources.compactTable(spark, s"${name}_keys", Seq("ck"), numBuckets),
    graft.sources.Sources.compactTable(spark, s"${name}_sigs", Seq("id"), numBuckets),
    graft.sources.Sources.compactTable(spark, s"${name}_buckets", Seq("bhash"), numBuckets))

  /** [[compactMinhashIndex]] behind the debt policy
    * ([[graft.sources.Sources.compactIfNeeded]]): each of the three tables
    * rewrites only once it exceeds `maxFilesPerBucket` files per bucket —
    * the unconditional after-append call of a daily ingest loop. Returns
    * stats for the tables actually rewritten (possibly none).
    */
  def compactMinhashIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
                                  name: String, numBuckets: Int = 16,
                                  maxFilesPerBucket: Int = 4): Seq[graft.sources.Sources.CompactStats] =
    Seq("keys" -> "ck", "sigs" -> "id", "buckets" -> "bhash").flatMap {
      case (t, c) => graft.sources.Sources.compactIfNeeded(
        spark, s"${name}_$t", Seq(c), numBuckets, maxFilesPerBucket)
    }

  /** The oversized-bucket observation ([[saltedBucketKeys]]'s metric)
    * extended to a STORED bucket table: one aggregate row (buckets,
    * max_bucket_rows, oversized_buckets) over the persisted index, so a
    * maintenance job can alert on skew that accumulated across appends —
    * the live-side `observe` only sees one batch at a time. `keyCols` is
    * the bucket identity: (bband, bhash) for the minhash index,
    * (bband, bbits) for the cosine index, (cell) for IVF cells.
    */
  def storedBucketStats(spark: org.apache.spark.sql.SparkSession, table: String,
                        keyCols: Seq[String], maxBucketSize: Int): DataFrame =
    spark.table(table)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("bucket_rows"))
      .agg(count(lit(1)).as("buckets"),
        max(col("bucket_rows")).as("max_bucket_rows"),
        sum(when(col("bucket_rows") > maxBucketSize, 1L).otherwise(0L))
          .as("oversized_buckets"))

  /** Probe the persisted LSH index with one ingestion batch — O(batch +
    * candidates) compute, never O(corpus). Returns the surviving batch
    * rows (original columns): rows whose content is neither an exact
    * duplicate of the corpus (anti-join on the stored content keys —
    * before any signature work) nor a near-duplicate (Jaccard >=
    * `threshold`) of any corpus content. Stage shape:
    *
    *  1. exact-dup anti-join against `<name>_keys` (batch-side shuffle
    *     only — the index side is bucketed on ck);
    *  2. collapse batch clones (one signature per distinct new content);
    *  3. batch signatures + band buckets — the ONLY MinHash computation
    *     in the whole probe plan (PlanAssertSpec pins exactly one
    *     MinHashShingles over the batch, none over the corpus);
    *  4. candidate equi-join against `<name>_buckets`;
    *  5. agreement prefilter against the STORED `<name>_sigs`;
    *  6. exact shingle-set verify — corpus text is re-fetched for the
    *     candidate ids alone (semi-join: the point-lookup pattern; the
    *     only corpus touch in the probe, two columns, candidate-sized);
    *  7. dropped contents expand back over batch clones via the key.
    *
    * `params` must match the index build (same shingleK/numHashes/bands).
    */
  def probeMinhashIndex(corpus: DataFrame, batch: DataFrame,
                        idCol: String, textCol: String, name: String,
                        shingleK: Int = 3, numHashes: Int = 48,
                        bands: Int = 6, threshold: Double = 0.9): DataFrame = {
    val spark = batch.sparkSession
    val rowsPerBand = numHashes / bands
    val parts = spark.sparkContext.defaultParallelism * 2
    val keys = spark.table(s"${name}_keys")
    val idxSigs = spark.table(s"${name}_sigs")
    val idxBuckets = spark.table(s"${name}_buckets")
    val b = batch.withColumn("__ck", contentKey(col(textCol)))
    val fresh = b.join(keys.select(col("ck").as("__ck")), Seq("__ck"), "left_anti")
    val uniqB = repCollapse(
      fresh.select(col("__ck").as("ck"), col(idCol).as("id"), col(textCol).as("text")))
    // repartition before the signature projection for the same reason
    // minhashPairs does: AQE coalesces the collapse group-by output on
    // small inputs, and the per-doc signature work — the probe's hot
    // path — must spread, not serialize
    val sigsB = uniqB.repartition(parts)
      .select(col("ck"), col("id"), col("text"),
        graft.expr.MinHashShingles(words(col("text")), shingleK, numHashes).as("bsig"))
    val bucketsB = sigsB
      .select(col("id"), explode(bandBuckets(col("bsig"), bands, rowsPerBand)).as("bb"))
      .select(col("bb.band").as("bband"), col("bb.bucket").as("bhash"), col("id").as("bid"))
    val cand = bucketsB.join(idxBuckets.withColumnRenamed("id", "cid"), Seq("bband", "bhash"))
      .select(col("cid").as("id_a"), col("bid").as("id_b")).distinct()
    val pre = cand
      .join(idxSigs.select(col("id").as("id_a"), col("sig").as("csig")), "id_a")
      .join(sigsB.select(col("id").as("id_b"), col("bsig")), "id_b")
      .filter(graft.expr.SigAgreement(col("csig"), col("bsig")) >= threshold - sigAgreementSlack)
      .select(col("id_a"), col("id_b"))
    val cSets = shingleSets(
      corpus.select(col(idCol).as("id"), col(textCol).as("text")),
      pre.select(col("id_a").as("id")).distinct(), shingleK, parts)
    val bSets = shingleSets(sigsB.select(col("id"), col("text")),
      pre.select(col("id_b").as("id")).distinct(), shingleK, parts)
    val droppedReps = verifyJaccard(pre, cSets, bSets, threshold)
      .select(col("id_b").as("id")).distinct()
    val droppedCks = uniqB.join(droppedReps, Seq("id"), "left_semi")
      .select(col("ck").as("__ck"))
    fresh.join(droppedCks, Seq("__ck"), "left_anti").drop("__ck")
  }

  /** SimHash: 64-bit signature — per bit, the sign of the sum of ±1 votes
    * from each distinct word's hash bit. Single map-side pass via the
    * native codegen'd [[graft.expr.SimHash64]] (the HOF `aggregate` +
    * `zip_with` formulation is CodegenFallback: interpreted, two boxed
    * 64-element arrays per word).
    */
  def simhash(text: Column): Column =
    graft.expr.SimHash64(array_distinct(words(text)))

  /** SimHash over md5-derived 60-bit word hashes (low 15 hex chars, the
    * [[TextAnalysis.gramHashes]] scheme) — the ORACLE-RESTATABLE hash
    * family: any engine with md5 + bit ops recomputes the signature
    * exactly, which is what promotes the SimHash queries from rows-only to
    * hash-checked. Same scheme, vote rule, and scale shape as [[simhash]];
    * the xxhash64 form stays the throughput choice (fused string hashing,
    * no per-word md5/conv), this one the verifiable choice. 60 bits keeps
    * the per-word hash inside a signed BIGINT everywhere.
    */
  def simhashMd5(text: Column, bits: Int = 60): Column =
    graft.expr.SimHashBits(
      transform(array_distinct(words(text)),
        w => conv(substring(md5(w.cast("binary")), 1, (bits + 3) / 4), 16, 10).cast("long")),
      bits)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: all (id_a, id_b, hamming) with
    * hamming(simhash_a, simhash_b) <= `maxHamming`, id_a < id_b. `sigOf`
    * picks the signature family ([[simhash]] xxhash64-fused by default;
    * [[simhashMd5]] for oracle restatability) and `bits` its width — the
    * bands tile `bits`, so both families get the same pigeonhole
    * guarantee.
    *
    * EXACT over the signature domain, not approximate: candidates come
    * from `maxHamming + 1` disjoint bit-bands of the `bits`-wide
    * signature, and by pigeonhole two signatures within `maxHamming`
    * differing bits agree on at least one whole band — so banding loses no
    * qualifying pair, it only prunes the non-qualifying ones before the
    * exact `bit_count(xor)` verify.
    *
    * Scale shape mirrors [[minhashPairs]]: identical signatures (clone
    * clusters — hamming 0) are collapsed first and their pairs emitted
    * via a linear equi-join, so band buckets see one representative per
    * distinct signature and a crawl dump's duplicate mass cannot go
    * quadratic inside a bucket; verified representative pairs expand back
    * to members through two equi-joins (identical signature ⇒ identical
    * hamming to anything). Shuffles: the signature group-by, the band
    * self-join, the expansion joins — all on keys, never all-pairs.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   sigOf: Column => Column = simhash,
                   bits: Int = 64): DataFrame = {
    val bands = maxHamming + 1
    val width = (bits + bands - 1) / bands // last band may run past the top bit — harmless
    val members = df.select(col(idCol).as("id"), sigOf(col(textCol)).as("sig"))
    val intra = members.select(col("sig"), col("id").as("id_a"))
      .join(members.select(col("sig").as("sig_b"), col("id").as("id_b")),
        col("sig") === col("sig_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("hamming"))
    val uniq = members.groupBy(col("sig")).agg(min(col("id")).as("id"))
    val banded = uniq.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * width)
            .bitwiseAND(lit(if (width == 64) -1L else (1L << width) - 1)).as("bits"))
      }: _*)).as("bk"))
    val a = banded.select(col("bk").as("ka"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("bk").as("kb"), col("id").as("id_b"), col("sig").as("sig_b"))
    val repPairs = a.join(b, col("ka") === col("kb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct() // a pair can agree on several bands
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")).cast("int"))
      .filter(col("hamming") <= maxHamming) // >= 1: equal sigs collapsed above
    val expanded = repPairs
      .join(members.select(col("sig").as("sig_a"), col("id").as("ma")), "sig_a")
      .join(members.select(col("sig").as("sig_b"), col("id").as("mb")), "sig_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    expanded.unionAll(intra)
  }

  /** Connected components over an undirected edge list — the pairs→clusters
    * step of every near-dup pipeline: LSH/SimHash emit PAIRS, but "keep one
    * document per duplicate cluster" needs the transitive closure (a~b, b~c
    * ⇒ {a,b,c} is one cluster even when a~c was never emitted).
    *
    * Algorithm: min-label propagation (Pregel-style). Every node starts
    * labeled with itself; each round a node takes the minimum label among
    * itself and its neighbors; fixpoint when no label changes. Each round
    * is one equi-join (labels→edges) plus one group-by min — both shuffles
    * on the node key, never all-pairs — and `localCheckpoint` truncates the
    * growing lineage so round N's plan does not replay rounds 1..N−1.
    *
    * Convergence is O(component diameter) rounds. Near-dup clusters are
    * dense (quasi-cliques around a template), so diameter is small — 2–3
    * rounds in practice; `maxIter` bounds the pathological chain. At true
    * 100 TB graph scale the alternating large-star/small-star scheme
    * (Kiveris et al., "Connected Components in MapReduce and Beyond")
    * converges in O(log²n) rounds independent of diameter and is the
    * drop-in upgrade here — same join+min building blocks, different
    * neighbor-set rewiring; for dedup-shaped graphs the plain propagation
    * is both simpler and fewer rounds. The per-round driver sync is one
    * aggregate (a changed-label count), not a data collect.
    *
    * Returns one row per node that appears in `edges`: (node, cluster_id,
    * cluster_size) with cluster_id = min node id in the component —
    * deterministic, engine-independent, and exactly what a keep-one-per-
    * cluster curation join consumes. Isolated documents (no edges) are by
    * definition their own singleton clusters and are not materialized.
    *
    * `checkpointDir` (both CC variants): reliable per-round checkpoints
    * accumulate in the directory and the caller owns its lifecycle —
    * delete after consuming the result, or enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints` (see [[ckpt]]).
    */
  /** Per-round lineage truncation for the iterative CC loops. Default is
    * `localCheckpoint` — executor-pinned blocks, zero extra I/O, right
    * for local mode and short interactive jobs. Pass `reliableDir` to
    * checkpoint to a fault-tolerant filesystem (HDFS/object store)
    * instead: at 100 TB on preemptible machines an executor loss under
    * `localCheckpoint` kills the whole iterative job, while a reliable
    * checkpoint bounds the blast radius to one round's recompute. The
    * trade-off is one distributed write per round — pay it when round
    * state is large and executors are mortal.
    *
    * Lifecycle: the reliable dir accumulates one rdd-N subdirectory per
    * checkpointed round; Spark exposes no handle to a Dataset
    * checkpoint's files, so THE CALLER owns the directory — delete it
    * after fully consuming the iterative result (the returned frame's
    * final round still reads from it), or run the session with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to reap
    * superseded rounds as their RDDs are GC'd. The CC entry points
    * document the same contract on their `checkpointDir` parameter.
    *
    * `eager` is honored on the localCheckpoint branch only: the reliable
    * branch is ALWAYS eager, because the cache-then-checkpoint idiom that
    * avoids the double compute (below) requires materializing while the
    * cache is alive — a lazy reliable checkpoint would re-run the round's
    * lineage at first use after unpersist.
    */
  private def ckpt(df: DataFrame, eager: Boolean, reliableDir: Option[String]): DataFrame =
    reliableDir match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir stores the QUALIFIED path of d/<random-UUID>;
        // qualify `d` the same way and compare the stored dir's PARENT for
        // equality — set once per dir (a fresh UUID dir per round would
        // scatter the checkpoints), and a later different dir that happens
        // to be a substring of the old path still takes effect.
        val qualified = {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
        }
        val alreadySet = sc.getCheckpointDir.exists(cur =>
          Option(new org.apache.hadoop.fs.Path(cur).getParent).exists(_.toString == qualified))
        if (!alreadySet) sc.setCheckpointDir(d)
        // Dataset.checkpoint launches its own write job from lineage —
        // unpersisted, every round would COMPUTE TWICE (once for the
        // caller's fixpoint action, once for the checkpoint write). Cache
        // the round, checkpoint eagerly from the cache, drop the cache:
        // one compute + one cached-read write per round.
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try cached.checkpoint(eager = true)
        finally cached.unpersist()
      case None => df.localCheckpoint(eager)
    }

  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val e0 = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(edges.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
    val e = ckpt(e0, eager = true, checkpointDir) // reused every round — compute the edge list once
    // Round 1 fused into initialization: everyone takes min(self, direct
    // neighbors) in the same group-by that builds the node set — a dense
    // (quasi-clique) near-dup cluster is DONE here, and the loop only
    // confirms the fixpoint.
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      // empty edge list (no near-dup pairs at all) sums to NULL
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var labels = ckpt(
      e.unionAll(e.select(col("src"), col("src").as("dst")))
        .groupBy(col("src")).agg(min(col("dst")).as("lbl"))
        .withColumnRenamed("src", "node"),
      eager = false, checkpointDir) // lazy: the label-sum action materializes it
    var prevSum = lblSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbr = e.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
      val next = ckpt(
        labels.unionAll(nbr)
          .groupBy(col("node")).agg(min(col("lbl")).as("lbl")),
        eager = false, checkpointDir) // lazy: one job per round (sum = materialize)
      // Convergence via ONE aggregate, no join: labels only ever decrease,
      // and a non-converged round strictly decreases at least one — so the
      // (exact, decimal) label sum is strictly monotone until fixpoint.
      val nextSum = lblSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— component diameter exceeds the bound; raise maxIter or switch to large-star/small-star")
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("node"), col("lbl").as("cluster_id"), col("cluster_size"))
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the 100 TB-scale path: O(log² n) rounds INDEPENDENT of component
    * diameter, where [[connectedComponents]]' min-label propagation needs
    * O(diameter) rounds (fine for dense near-dup clusters, pathological
    * for chain-shaped graphs). Same building blocks per round — a
    * group-by-min and an equi-join on the node key, never all-pairs:
    *
    *  - large-star: every node u computes m = min(Γ(u) ∪ {u}) and rewires
    *    each STRICTLY LARGER neighbor v to m — tall trees flatten
    *    geometrically;
    *  - small-star: every node u rewires its smaller-or-self closure
    *    {v ∈ Γ(u): v < u} ∪ {u} to its minimum — stars consolidate;
    *  - fixpoint when a full round leaves the canonical edge set
    *    unchanged (size + xxhash64 checksum, one aggregate — no join);
    *    at fixpoint the graph is a forest of stars, each centered at its
    *    component's minimum node.
    *
    * Returns the same (node, cluster_id, cluster_size) contract as
    * [[connectedComponents]] — `DedupSpec` pins the two equal on chains,
    * cliques, stars, and random graphs.
    */
  def connectedComponentsBigStar(edges: DataFrame, aCol: String, bCol: String,
                                 maxIter: Int = 30,
                                 checkpointDir: Option[String] = None): DataFrame = {
    def sym(pairs: DataFrame): DataFrame =
      pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("src")).agg(least(min(col("dst")), col("src")).as("m"))
      e.filter(col("dst") > col("src")).join(m, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val neigh = e.filter(col("dst") < col("src"))
      val m = neigh.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val rewired = neigh.join(m, "src")
      rewired.filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionAll(rewired.select(col("src"), col("m").as("dst")).distinct())
    }
    // (count, checksum) of the canonical (small, large) edge set — one
    // aggregate; equality of both ⇒ the round was a no-op (rewiring only
    // ever replaces endpoints with smaller ones, so the set evolution is
    // monotone and a checksum tie is a true fixpoint up to 2⁻⁶⁴ hash luck).
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(least(col("src"), col("dst")),
          greatest(col("src"), col("dst"))).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    val raw = edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // Canonical undirected edge list INCLUDING self-loops, checkpointed
    // ONCE: both the star iteration (via sym, which drops self-loops) and
    // the self-loop singleton recovery below read this artifact — the
    // (possibly expensive) upstream pair pipeline never re-executes.
    val base = ckpt(raw.select(least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst")).distinct(),
      eager = true, checkpointDir)
    // base is canonical (src <= dst) and distinct, so after dropping
    // self-loops the two directions cannot collide — symmetrize without
    // paying sym()'s distinct exchange again.
    val nonSelf = base.filter(col("src") =!= col("dst"))
    var e = nonSelf.unionAll(
      nonSelf.select(col("dst").as("src"), col("src").as("dst")))
    var prev = sig(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      e = ckpt(sym(smallStar(sym(largeStar(e)))), eager = false, checkpointDir) // sig() materializes
      val cur = sig(e)
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      iter += 1
    }
    require(converged,
      s"connectedComponentsBigStar did not converge in $maxIter rounds")
    // fixpoint: stars centered at component minima. Non-center nodes hold
    // exactly one (node > center) edge; centers label themselves.
    val stars = e.filter(col("src") > col("dst"))
      .select(col("src").as("node"), col("dst").as("lbl")).distinct()
    val centers = stars.select(col("lbl")).distinct()
      .select(col("lbl").as("node"), col("lbl"))
    // sym() drops self-loops from the iteration (they carry no
    // connectivity), but the output contract is one row per node that
    // APPEARS in `edges` — so a node whose only edge is (a, a) comes back
    // as its own singleton cluster, exactly as [[connectedComponents]]
    // emits it (DedupSpec pins the two equal on a self-loop edge list).
    val loners = base.filter(col("src") === col("dst"))
      .select(col("src").as("node"))
      .join(stars.select(col("node"))
        .unionAll(centers.select(col("node"))), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("lbl"))
    val labels = stars.unionAll(centers).unionAll(loners)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("node"), col("lbl").as("cluster_id"), col("cluster_size"))
  }

  /** Blocked exact n-gram Jaccard pairs: brute force WITHIN `blockCol`
    * only. The baseline the LSH path approximates; at scale the cost is
    * sum of block² not corpus².
    */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, threshold: Double): DataFrame = {
    // Two-phase shape: (1) candidate generation joins LIGHT rows only
    // (id, block, set size) — the size-ratio bound (Jaccard ≤ min/max
    // sizes) prunes inside the join, and even a skewed block only loops
    // over 8-byte ids; (2) the surviving pairs are round-robin
    // repartitioned (explicit count — AQE would coalesce on byte stats
    // that under-estimate the verify cost) and only then joined back to
    // the word sets for the exact-Jaccard verify, so the heavy
    // intersect work is spread evenly across the cluster no matter how
    // skewed the blocks are.
    val base = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_sort(array_distinct(words(col(textCol)))).as("ws"))
      .withColumn("n", size(col("ws")))
    val ids = base.select(col("blk"), col("id"), col("n"))
    val a = ids.select(col("blk"), col("id").as("id_a"), col("n").as("n_a"))
    val b = ids.select(col("blk").as("blk_b"), col("id").as("id_b"), col("n").as("n_b"))
    val cand = a.join(b,
      col("blk") === col("blk_b") && col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") /
          greatest(col("n_a"), col("n_b")) >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("n_a"), col("n_b"))
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    val sets = base.select(col("id"), col("ws"))
    cand.repartition(parts)
      .join(sets.select(col("id").as("id_a"), col("ws").as("ws_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("ws").as("ws_b")), "id_b")
      .withColumn("sim", jaccardWithSizes(col("ws_a"), col("ws_b"), col("n_a"), col("n_b")))
      .filter(col("sim") >= threshold)
      .select(col("blk").as("block"), col("id_a"), col("id_b"),
        round(col("sim"), 6).as("sim"))
  }
}
