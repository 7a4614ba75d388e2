package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language-ID heuristic, document fingerprinting. All native
  * expressions — one map-side pass per document, no shuffles, no UDFs.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces + standalone punctuation. A cheap
    * deterministic proxy for subword tokenizers (cluster-side parity with
    * an actual BPE requires the vocab file — out of scope by design).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  private def wordsOf(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct-word ratio (repetition detector). */
  def distinctRatio(text: Column): Column = distinctRatioW(wordsOf(text))

  /** As [[distinctRatio]] over a precomputed word array. Every `*W` form
    * exists so multi-score projections can MATERIALIZE the split once and
    * feed all consumers (an expression tree that repeats `split` — e.g.
    * langId's argmax, or a pushed-down filter on a scored alias —
    * re-evaluates the regex split at every occurrence).
    */
  def distinctRatioW(ws: Column): Column =
    size(array_distinct(ws)).cast("double") / size(ws).cast("double")

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      length(text).cast("double")

  private val stopwords = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"))

  /** Stopword hit ratio for one language list. */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordRatioW(wordsOf(text), lang)

  def stopwordRatioW(ws: Column, lang: String = "en"): Column =
    graft.expr.StopwordHits(ws, stopwords(lang)).cast("double") /
      size(ws).cast("double")

  /** n-gram-heuristic language ID: argmax of stopword hits across the
    * built-in lists; ties break by language code order; no hits → "und".
    * NOTE the argmax tree references each hit-count ~2× per reduce level —
    * pass a materialized word array ([[langIdW]]) so what gets repeated is
    * an attribute read, not the split.
    */
  def langId(text: Column): Column = langIdW(wordsOf(text))

  def langIdW(ws: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (code, sw) =>
      struct(graft.expr.StopwordHits(ws, sw).as("hits"),
        lit(code).as("code"))
    }
    val best = scored.reduce((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Round-half-up integer division of nonnegative longs without any
    * float op: `(2a + b) div (2b)`. Inputs here stay < 2^43, so the
    * doubled numerator cannot overflow.
    */
  private def divHalfUp(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(a * 2 + b),
        org.apache.spark.sql.GraftBridge.expression(b * 2)))

  /** Composite quality score in INTEGER MICRO-UNITS [0, 1_000_000]:
    * length sweet-spot, low punctuation, vocabulary diversity — each
    * component quantized to micro-units with round-half-up integer
    * division, then averaged the same way. Every input is an integer
    * count (chars, punct chars, distinct words, words), so the score is
    * exact integer arithmetic end-to-end: no IEEE expression ever feeds
    * a filter boundary or a sum, and any engine with 64-bit integers
    * reproduces it bit-for-bit. (The previous double formulation was
    * cross-engine flaky exactly at threshold rows — documents whose raw
    * score sits ON `0.75` flip membership with 1-ulp library
    * differences.) Monotone in its parts; [0, 1e6] by construction.
    */
  def qualityMicro(text: Column, ws: Column): Column = {
    val len = length(text).cast("long")
    val punct = len - length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")).cast("long")
    val n = size(ws).cast("long")
    val d = size(array_distinct(ws)).cast("long")
    val lenMu = least(len * 5000L, lit(1000000L))           // min(len/200, 1)
    val punctMu = lit(1000000L) -
      least(divHalfUp(punct * 5000000L, len), lit(1000000L)) // 1 - min(5p/len, 1)
    val divMu = divHalfUp(d * 1000000L, n)                   // d/n
    divHalfUp(lenMu + punctMu + divMu, lit(3L))
  }

  /** [[qualityMicro]] rescaled to a display double in [0,1]. The single
    * division by 1e6 is one correctly-rounded IEEE op on an exact
    * integer — bit-identical in any engine. Use [[qualityMicro]] (not
    * this) wherever the score feeds a filter, sum, or rank.
    */
  def qualityScore(text: Column): Column = qualityScoreW(text, wordsOf(text))

  def qualityScoreW(text: Column, ws: Column): Column =
    qualityMicro(text, ws).cast("double") / 1e6

  /** Exact content fingerprint (md5 of normalized text) — cross-engine
    * checkable; see Dedup.contentKey for the prefix variant.
    */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", split(trim(lower(text)), "\\s+")).cast("binary"))

  /** 64-bit rolling fingerprint (xxhash64 of the normalized text) — the
    * cheap cluster-side key for shard-local dedup maps.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(concat_ws(" ", split(trim(lower(text)), "\\s+")))

  /** Winnowing document fingerprints (the MOSS scheme): hash every word
    * k-gram, then keep the minimum hash of each sliding window of `w`
    * consecutive gram hashes — a deterministic, position-robust selection
    * of ~1/w of the grams. Two documents sharing a run of ≥ k+w−1 words
    * share a fingerprint, which makes the DISTINCT fingerprint set the
    * classic substring-overlap detector (plagiarism / quote / boilerplate
    * detection — finer-grained than MinHash's whole-document similarity).
    *
    * The gram hash is the low 60 bits of md5 (not xxhash64) so the result
    * is restatable in any engine with md5 — that keeps the operator
    * oracle-checkable. All steps are native expressions; `wsCol`/`hsCol`
    * must be MATERIALIZED columns (see the q37 note on lambda CSE):
    * lambdas here only dereference attributes and their own element.
    * Map-side only, no shuffles.
    */
  def gramHashes(wsCol: Column, k: Int): Column = {
    val grams = when(size(wsCol) >= k,
      transform(sequence(lit(0), size(wsCol) - k),
        i => concat_ws(" ", slice(wsCol, i + lit(1), lit(k)))))
      .otherwise(array(concat_ws(" ", wsCol)))
    transform(grams, g =>
      conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long"))
  }

  def winnow(hsCol: Column, w: Int): Column =
    array_sort(array_distinct(
      when(size(hsCol) >= w,
        transform(sequence(lit(0), size(hsCol) - w),
          i => array_min(slice(hsCol, i + lit(1), lit(w)))))
        .otherwise(array(array_min(hsCol)))))

  /** Longest run of consecutive equal elements — 0 for an empty array.
    * The repetition primitive behind the Gopher-style quality signals:
    * `maxRunLengthW(ws)` is the longest immediate word repeat, and
    * `maxRunLengthW(array_sort(ws))` is the occurrence count of the MOST
    * FREQUENT element (the mode count) without any per-document shuffle —
    * sorting groups equal elements into one run.
    *
    * Runs are found as boundary indices (positions where the element
    * differs from its predecessor) and max-diffed — one filtered index
    * sequence + one zip_with, all native. `arr` MUST be a materialized
    * attribute: the lambdas dereference it per element (the q37 CSE note),
    * so an inlined `array_sort(...)` argument would re-sort per element.
    */
  def maxRunLengthW(arr: Column): Column = {
    val starts = filter(sequence(lit(1), size(arr)),
      i => (i === lit(1)) || element_at(arr, i) =!= try_element_at(arr, i - lit(1)))
    val ends = concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
      array(size(arr) + lit(1)))
    when(size(arr) === 0, lit(0))
      .otherwise(array_max(zip_with(ends, starts, (e, s) => e - s)))
  }

  private val observeSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Winnow POSTINGS LIST: one row per (document, distinct winnow
    * fingerprint) — the inverted-index input for substring-overlap
    * self-joins and train/eval decontamination probes. Hash-partitioned by
    * fingerprint, so a downstream equi-join on `fp` adds no shuffle, and a
    * self-join's two sides reuse the one exchange.
    *
    * STOP-FINGERPRINT GUARD: a fingerprint shared by more than
    * `maxDocsPerFp` documents is boilerplate (license headers, navigation
    * chrome — exactly what crawl corpora contain), and an inverted-index
    * self-join on it produces an m² pair bucket: the overlap analogue of
    * the LSH mega-bucket. Like stopwords, such fingerprints carry no
    * overlap SIGNAL — sharing a run that a corpus-scale document set also
    * shares identifies nothing — so they are DROPPED, not salted (a pair
    * of documents whose only commonality is boilerplate is a false
    * positive, where for MinHash a mega-bucket still holds true near-dups).
    * The per-fp document count is one window over the same hash
    * partitioning (no extra exchange), and the dropped row count is
    * published via `observe` ("winnow_postings_<n>": stop_fp_rows — the
    * name carries a sequence number so two differently-parameterized calls
    * compose in one query).
    */
  def winnowPostings(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, w: Int = 4,
                     maxDocsPerFp: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posts = df
      .select(col(idCol), wordsOf(col(textCol)).as("__ws"))
      .select(col(idCol), gramHashes(col("__ws"), k).as("__hs"))
      .select(col(idCol), explode(winnow(col("__hs"), w)).as("fp"))
      .repartition(col("fp"))
      .withColumn("__nd", count(lit(1)).over(Window.partitionBy(col("fp"))))
    val seq = observeSeq.incrementAndGet()
    posts
      .observe(s"winnow_postings_$seq",
        sum(when(col("__nd") > maxDocsPerFp, 1L).otherwise(0L)).as("stop_fp_rows"))
      .filter(col("__nd") <= maxDocsPerFp)
      .select(col(idCol), col("fp"))
  }

  /** Sliding-window passage chunking — the context-window packing step
    * between curation and tokenization: `window`-word chunks advancing by
    * `stride` (overlap = window − stride), the last chunk
    * short-but-reaching-the-end, a doc that fits in one window emitting
    * exactly one chunk. Pure map-side: the chunk-index sequence and slices
    * are native array ops inside one projection (word array materialized
    * first — the lambda-CSE rule), then ONE explode; no shuffle. Emits the
    * chunk md5 fingerprint + word count, not the text — downstream
    * chunk-level dedup joins on the 16-byte key, never the strings.
    */
  def chunkPassages(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride, s"need window >= stride > 0, got ($window, $stride)")
    val ws = col("__ws")
    val nchunks = (lit(1) +
      ceil(greatest(size(ws) - window, lit(0)).cast("double") / stride)).cast("int")
    val chunks = transform(sequence(lit(0), col("__nc") - 1),
      i => struct(i.as("chunk_id"),
        concat_ws(" ", slice(col("__ws"), i * stride + 1, lit(window))).as("chunk")))
    df.select(col(idCol), wordsOf(col(textCol)).as("__ws"))
      .select(col(idCol), ws, nchunks.as("__nc"))
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_id").as("chunk_id"),
        size(split(col("__c.chunk"), " ")).as("n_words"),
        md5(col("__c.chunk").cast("binary")).as("chunk_fp"))
  }

  /** Cross-document chunk dedup — the boilerplate-removal pass of a web
    * curation pipeline (CCNet's paragraph dedup / RefinedWeb's
    * repeated-line filter, adapted to this corpus's flat word stream):
    * split every document into non-overlapping `k`-word chunks, count
    * each chunk's distinct-document frequency corpus-wide, and drop
    * chunk INSTANCES whose chunk occurs in ≥ `minDocs` documents. Emits
    * per document the chunk count, the dropped count, and the md5
    * fingerprint of the kept chunks in original order — the reassembled
    * text's identity without ever shuffling the text itself.
    *
    * Scale shape: one map-side chunk explode carrying (id, pos, chunk);
    * ONE count shuffle keyed by chunk (partially aggregated — the
    * distinct-doc count's first phase collapses a document's repeats of
    * a chunk map-side); a keyed join of instances against the
    * boilerplate set — which is the HEAD of the frequency distribution,
    * orders of magnitude smaller than the chunk universe, and
    * broadcastable at any corpus size; and a per-document re-aggregation
    * whose state is one document's own chunks (`array_sort` of the kept
    * (pos, chunk) pairs restores original order deterministically —
    * `collect_list` order is not).
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 k: Int, minDocs: Int): DataFrame = {
    require(k > 0 && minDocs >= 2, s"need k > 0, minDocs >= 2, got ($k, $minDocs)")
    val ch = df
      .select(col(idCol), wordsOf(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col(idCol), explode(transform(
        sequence(lit(0), floor(size(col("__ws")) / k).cast("int") - 1),
        i => struct(i.as("pos"),
          concat_ws(" ", slice(col("__ws"), i * k + 1, lit(k))).as("chunk")))).as("__c"))
      .select(col(idCol), col("__c.pos").as("pos"), col("__c.chunk").as("chunk"))
    val bp = ch.groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("chunk"), lit(true).as("__bp"))
    ch.join(bp, Seq("chunk"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__bp"), 1L).otherwise(0L)).as("n_dropped"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("__bp").isNull,
            struct(col("pos"), col("chunk"))))),
          c => c.getField("chunk"))).cast("binary")).as("kept_fp"))
  }

  /** Fixed-budget sequence packing — stream documents into `budget`-token
    * training sequences. Distributed shape: docs hash into `shards` shards
    * (md5-derived, engine-independent), each shard orders ITS docs
    * deterministically (md5 rank) and assigns pack = floor(tokens-before /
    * budget) from ONE window cumulative sum — first-fit stream packing
    * whose (shard, pack_id, offset) layout is identical on any engine or
    * cluster size. The only shuffle is the shard exchange; window state is
    * one running long per shard; parallelism scales with `shards` (set it
    * ≈ cluster cores at 100 TB).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hk = md5(col(idCol).cast("string").cast("binary"))
    val shard = pmod(Dedup.md5Long60(col(idCol)), lit(shards))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(textCol).as("__text"), hk.as("__hk"), shard.as("shard"))
      .select(col(idCol), col("__hk"), col("shard"),
        tokenCount(col("__text")).as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        // exact integer floor division: Spark's `/` on integral operands
        // is IEEE double division, whose ulp rounding can cross an
        // integer boundary once a shard's cumulative count exceeds ~2^52
        // — `div` keeps the layout engine-independent at any scale.
        expr(s"(__cum - n_tokens) div $budget").as("pack_id"),
        ((col("__cum") - col("n_tokens")) % budget).as("offset"))
  }

  /** Per-document top-`k` TF-IDF terms — the keyword-extraction pass of a
    * curation pipeline. Term frequencies come from one (doc, term) shuffle
    * with map-side partial counts; document frequencies count rows of the
    * already-aggregated tf table (exact, no distinct); the corpus size
    * joins in as a broadcast 1-row aggregate (no driver action); score =
    * tf·ln(N/df); a per-doc window keeps the top `k`. Every exchange is
    * keyed — the vocabulary never sits on the driver.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol), explode(wordsOf(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n_docs"))
    // idf quantized to integer micro-nats BEFORE scoring: libm ln is only
    // ~1-ulp accurate (unlike +,−,×,÷,√) and engines may differ in the
    // last bit — ranking by an unrounded double product would let that
    // ulp reorder near-equal terms and change the emitted top-k row set.
    // After quantization the score is an exact integer, so ranking and
    // output are engine-independent (up to the ~1e-10-probability event
    // of ln landing within an ulp of a .5 micro-nat boundary).
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf_mu").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf_mu",
        round(log(col("__n_docs").cast("double") / col("df")) * 1e6).cast("long"))
      .withColumn("tfidf_mu", col("tf") * col("idf_mu"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"),
        (col("tfidf_mu").cast("double") / 1e6).as("tfidf"))
  }
}
