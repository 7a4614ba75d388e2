package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact dedup: keep the row with the minimal `tieBreak` per content key.
    * One shuffle on the 128-bit key; map-side partial min. Equivalent to
    * the reference user's drop-duplicates-by-hash pattern at any scale.
    */
  def exactDedup(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val keyed = df.withColumn("__key", key)
    val keep = keyed.groupBy(col("__key"))
      .agg(min(tieBreak).as("__keep"), count(lit(1)).as("group_size"))
    keyed.join(keep,
        keyed("__key") === keep("__key") && tieBreak === col("__keep"))
      .drop("__keep").drop(keep("__key"))
      .withColumnRenamed("__key", "content_key")
  }

  /** Word k-shingles (distinct). `transform` over an index sequence is the
    * native sliding window — no explode, no shuffle.
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

  /** MinHash-LSH near-duplicate pairs: band-bucket candidate generation,
    * exact-Jaccard verification at `threshold`. Returns (id_a, id_b, sim)
    * with id_a < id_b.
    *
    * Shuffles: explode→groupBy on (band,bucket) [bounded by docs×bands],
    * then two hash joins back to the shingle sets. Never all-pairs.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 48, bands: Int = 6,
                   threshold: Double = 0.9): DataFrame = {
    val rowsPerBand = numHashes / bands
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    // Shingle + signature once, then ONE explicit exchange: the enriched
    // rows feed four downstream branches (bucket l/r sides, set a/b
    // sides) and without the shared shuffle boundary each branch would
    // re-tokenize and re-minhash the corpus (ReuseExchange dedups the
    // exchange; the repartition also spreads a single-split input before
    // the most CPU-heavy map stage of the pipeline).
    val enriched = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", array_sort(shingles(col("text"), shingleK)))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("n", size(col("sh")))
      .select(col("id"), col("sh"), col("sig"), col("n"))
      .repartition(parts)
    val buckets = enriched
      .select(col("id"), explode(bandBuckets(col("sig"), bands, rowsPerBand)).as("b"))
    // candidate pairs: ids sharing a band bucket (distinct across bands).
    // Explicit probe-side spread — broadcast joins inherit probe
    // partitioning, and byte-based AQE stats under-estimate pair blow-up.
    val l = buckets.select(col("b").as("lb"), col("id").as("id_a"))
      .repartition(parts, col("lb"))
    val r = buckets.select(col("b").as("rb"), col("id").as("id_b"))
    val cand = l.join(r, col("lb") === col("rb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // Two-stage verification: (1) estimate Jaccard from the COMPACT
    // signatures (48 longs/row) with a conservative margin — E[agreement]
    // = J, so threshold−0.15 keeps recall while pruning most candidates —
    // then (2) only survivors join the heavy shingle sets for the exact
    // check with the size-ratio bound.
    val sigs = enriched.select(col("id"), col("sig"))
    val estimated = cand
      .repartition(parts) // even spread of the verify work (see blockedJaccardPairs)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(graft.expr.SigAgreement(col("sig_a"), col("sig_b")) >= threshold - 0.15)
      .select(col("id_a"), col("id_b"))
    val sets = enriched.select(col("id"), col("sh"), col("n"))
    estimated
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b")), "id_b")
      // size-ratio prefilter: Jaccard(a,b) <= min|.|/max|.| — kills most
      // candidates with two int ops before the array intersect runs
      .filter(least(col("n_a"), col("n_b")).cast("double") /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .withColumn("sim", jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** SimHash: 64-bit signature — per bit, the sign of the sum of ±1 votes
    * from each word's hash bit. Single map-side pass (`aggregate` over the
    * word array with a 64-slot accumulator).
    */
  def simhash(text: Column): Column = {
    val ws = array_distinct(words(text))
    // literal per-bit masks (shift amounts must be static in the Scala API)
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val votes = aggregate(
      ws,
      array_repeat(lit(0L), 64),
      (acc, w) => zip_with(acc,
        transform(masks, m => when(xxhash64(w).bitwiseAND(m) =!= 0, 1L).otherwise(-1L)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

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
