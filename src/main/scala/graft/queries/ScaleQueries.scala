package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scale.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators over `documents` / `embeddings`.
  * Oracle-checked where the computation is engine-independent (exact
  * dedup, blocked Jaccard, brute-force cosine, SimHash on the md5-derived
  * family, winnowing, text stats, media metadata); the remaining
  * xxhash64/k-means paths (hyperplane-LSH ANN, IVF NN, decode stub) get
  * the driver's rows-only check plus recall/parity tests in the spec
  * suite.
  */
object ScaleQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: one shuffle on a 16-byte md5 content key.
    "q15_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(
          Tables(s, dir, "documents"),
          Dedup.contentKey(col("text"), prefixWords = 8),
          col("doc_id"))
        .select(col("doc_id"), col("content_key"), col("group_size"))
    }),

    // MinHash-LSH near-dup: banded candidates, exact-Jaccard verified.
    // HASH-CHECKED against DuckDB brute force: the output is EXACT Jaccard
    // (Jaccard over 64-bit shingle hashes ≡ string-shingle Jaccard absent
    // ~n²/2⁶⁵ collisions), and at (48 hashes, 6 bands, t=0.9) LSH recall
    // is 1.0 on this corpus (verified: brute force finds the same 25
    // pairs at sf0.01; the pipeline is deterministic, so this holds for
    // every run on the same data). DedupSpec guards recall at sf0.001.
    "q16_minhash_neardup" -> ((s, dir) => {
      Dedup.minhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
          shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
    }),

    // Blocked exact n-gram Jaccard — the verifiable brute-force baseline.
    "q17_jaccard_pairs" -> ((s, dir) => {
      Dedup.blockedJaccardPairs(Tables(s, dir, "documents"),
        "doc_id", "text", "lang", threshold = 0.9)
    }),

    // Brute-force cosine top-k against the vec_id=0 embedding.
    "q18_cosine_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val query = emb.filter(col("vec_id") === 0)
        .select(Similarity.toDouble(col("embedding")))
        .head().getSeq[Double](0).toSeq // the query point: one driver-side vector
      val e = Similarity.toDouble(col("embedding"))
      val q = array(query.map(lit): _*)
      emb.select(col("vec_id"), round(Similarity.cosine(e, q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(20)
    }),

    // ANN: hyperplane-LSH bucket probe + exact rerank, on the md5-derived
    // plane family so the oracle independently recomputes planes,
    // signatures, probe set, and rerank — HASH-CHECKED (the xxhash64-fused
    // HyperplaneSig form keeps its recall spec in SimilaritySpec).
    "q19_ann_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val query = emb.filter(col("vec_id") === 0)
        .select(Similarity.toDouble(col("embedding")))
        .head().getSeq[Double](0).toSeq
      Similarity.annTopKMd5(emb, "embedding", "vec_id", query, k = 10, dim = 64,
          numPlanes = 12, maxHammingProbe = 6)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // Per-document text analysis: counts, ratios, lang-ID, quality, md5.
    "q20_text_stats" -> ((s, dir) => {
      val t = col("text")
      val ws = col("ws")
      Tables(s, dir, "documents")
        .select(col("doc_id"), t, Dedup.words(t).as("ws")) // split ONCE
        .select(
          col("doc_id"),
          TextAnalysis.wordCount(t).as("n_words"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          round(TextAnalysis.distinctRatioW(ws), 6).as("distinct_ratio"),
          round(TextAnalysis.punctRatio(t), 6).as("punct_ratio"),
          round(TextAnalysis.stopwordRatioW(ws, "en"), 6).as("stopword_ratio"),
          TextAnalysis.langIdW(ws).as("lang_guess"),
          TextAnalysis.qualityScoreW(t, ws).as("quality"),
          md5(concat_ws(" ", ws).cast("binary")).as("fp_md5"))
    }),

    // SimHash signatures — the md5-derived 60-bit hash family, chosen (like
    // winnowing's gram hash) so DuckDB can recompute every signature with
    // md5 + bit arithmetic: HASH-CHECKED, not rows-only. The xxhash64-fused
    // SimHash64 stays the registered throughput form (DedupSpec pins its
    // behavior); the scheme is identical.
    "q21_simhash" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhashMd5(col("text")).as("sig"))
    }),

    // SimHash near-dup pairs: pigeonhole bit-band candidates, exact
    // hamming verify — on the md5 family, so the DuckDB oracle brute-forces
    // hamming over independently recomputed signatures (the banding must
    // then find EXACTLY the brute-force pair set; DedupSpec additionally
    // pins the xxhash64 family against its own brute force).
    "q36_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, sigOf = Dedup.simhashMd5(_), bits = 60)
    }),

    // Multimodal metadata path: binary payload, typed meta, byte sampling.
    "q22_multimodal_meta" -> ((s, dir) => {
      val df = Multimodal.withMedia(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        col("text").cast("binary"), "text/plain")
      df.select(
        col("doc_id"),
        col("media.meta.mime").as("mime"),
        col("media.meta.size_bytes").as("size_bytes"),
        hex(Multimodal.sampleBytes(col("media.payload"), 0, 8)).as("head_hex"))
    }),

    // Embedding-cosine near-dup: exact nearest neighbor per vector.
    "q29_embedding_nn" -> ((s, dir) => {
      Similarity.nnJoin(Tables(s, dir, "embeddings"), "embedding", "vec_id")
    }),

    // The SCALE path for the same primitive: IVF-bucketed approximate NN
    // join at nprobe/K = 1/4 of the brute-force compute, with TWO-LEVEL
    // routed assignment (S ≈ √K super-cells, probe ⌈S/2⌉) — the full
    // 10⁹⁺-vector shape, exercised end to end at every SF. HASH-CHECKED
    // since round 10 (the q82 seed-centroid move carried to routing):
    // centroids are [[Similarity.seedCentroids]] and super-cells
    // [[Similarity.seedSuperCells]] — integer selections plus one argmax,
    // so the DuckDB oracle restates the ENTIRE routed pipeline (seed
    // selection, super selection, kid assignment, top-superProbe routing,
    // children-only top-nprobe cells, home-cell membership, candidate
    // argmax) and a flipped routing decision anywhere is hash-red. The
    // PRODUCTION dial — trained Lloyd centroids + trained supers
    // ([[Similarity.trainCentroids]]/[[Similarity.trainSuperCells]],
    // inherently non-restatable driver float iteration) — stays
    // spec-pinned in SimilaritySpec: recall floors vs the exact join,
    // nprobe=K ≡ exact, superProbe=S ≡ flat.
    "q33_embedding_nn_ivf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val (cents, nprobe) = Similarity.seedCentroids(emb, "embedding", "vec_id")
      val (sup, kids, superProbe) = Similarity.seedSuperCells(cents)
      Similarity.ivfNnJoin(emb, "embedding", "vec_id", cents, nprobe = nprobe,
        routing = Some((sup, kids, superProbe)))
    }),

    // The approximation-quality artifact for the IVF machinery: recall@1
    // of the IVF join measured against the exact join, emitted as a
    // VERIFIABLE single-row result (integer counts + round-half-up
    // permille). HASH-CHECKED since round 9 (the q103 move): centroids
    // come from [[Similarity.seedCentroids]] — unit-normalized corpus
    // vectors at id % ⌈√n⌉ = 0, id-ordered — so the DuckDB oracle
    // restates the ENTIRE pipeline (seed selection, cell assignment,
    // nprobe probing, candidate argmax, recall division) and one flipped
    // assignment or missed candidate is hash-red at the driver gate.
    // Since round 10 the same move covers q33's ROUTED pipeline too
    // (seedSuperCells), so every registered query carries a real oracle;
    // the trained-k-means dial stays spec-pinned in SimilaritySpec
    // (mean-cos-gap + routed-degeneration tests) because driver Lloyd
    // iterations are inherently non-restatable.
    "q82_ivf_recall" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val exact = Similarity.nnJoin(emb, "embedding", "vec_id")
        .select(col("vec_id"), col("nn_id").as("exact_nn"))
      val (cents, nprobe) = Similarity.seedCentroids(emb, "embedding", "vec_id")
      val approx = Similarity.ivfNnJoin(emb, "embedding", "vec_id", cents,
          nprobe = nprobe)
        .select(col("vec_id"), col("nn_id").as("ivf_nn"))
      // LEFT join from the exact side: a vector the IVF join returns no
      // row for is a recall MISS and must stay in the denominator — an
      // inner join would silently drop it and inflate the artifact.
      exact.join(approx, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("ivf_nn") === col("exact_nn"), 1L).otherwise(0L)).as("n_match"))
        .withColumn("recall_permille",
          expr("(n_match * 2000 + n_vectors) div (n_vectors * 2)"))
    }),

    // q82's audit at GROWING-corpus scale: the exact side is recomputed
    // only for a deterministic 10% md5 sample of the QUERY vectors
    // (md5(vec_id) mod 10 = 0 — engine/cluster-independent, no sampling
    // state), while the corpus side stays FULL on both legs, so every
    // sampled query's exact_nn is its true corpus-wide neighbor and the
    // left-join denominator stays honest. The exact audit cost drops 10×
    // (and dials further down at 100 TB by raising the modulus); the IVF
    // leg is the unchanged q82 join being audited. HASH-CHECKED like q82
    // (seed centroids; md5 sampling restated via the q57 conv-of-md5
    // fragment), so the scale-shape audit carries a real oracle too.
    "q89_ivf_recall_sampled" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val sample = emb.filter(pmod(Dedup.md5Long60(col("vec_id")), lit(10)) === 0)
      val exact = Similarity.nnJoinAgainst(sample, emb, "embedding", "vec_id")
        .select(col("vec_id"), col("nn_id").as("exact_nn"))
      val (cents, nprobe) = Similarity.seedCentroids(emb, "embedding", "vec_id")
      val approx = Similarity.ivfNnJoin(emb, "embedding", "vec_id", cents,
          nprobe = nprobe)
        .select(col("vec_id"), col("nn_id").as("ivf_nn"))
      exact.join(approx, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_sampled"),
          sum(when(col("ivf_nn") === col("exact_nn"), 1L).otherwise(0L)).as("n_match"))
        .withColumn("recall_permille",
          expr("(n_match * 2000 + n_sampled) div (n_sampled * 2)"))
    }),

    // Quantized candidate generation + exact rerank — the memory-bound
    // scale lever ([[Similarity.quantizeInt8]]): rank the corpus by
    // cosine over per-vector int8 quantizations (4× smaller scan side;
    // quantized dots are exact small integers, so the candidate ranking
    // is engine-independent), TakeOrdered the top 4k shortlist, then
    // rerank those rows with the true float cosine. Same answer surface
    // as q18 — and the oracle restates BOTH stages (quantization,
    // shortlist cut, rerank), so the approximation pipeline itself is
    // hash-checked, not just its final top-k.
    "q84_quantized_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val e = Similarity.toDouble(col("embedding"))
      val quant = emb.select(col("vec_id"), e.as("e"))
        .withColumn("sc", Similarity.int8Scale(col("e")))
        .withColumn("qv", Similarity.quantizeInt8(col("e"), col("sc")))
      val qrow = quant.filter(col("vec_id") === 0)
        .select(col("qv"), col("e")).head()
      val qq = array(qrow.getSeq[Int](0).map(i => lit(i.toDouble)): _*)
      val qe = array(qrow.getSeq[Double](1).map(lit): _*)
      val qvd = Similarity.toDouble(col("qv"))
      val cand = quant
        .withColumn("qcos", Similarity.dot(qvd, qq) /
          (Similarity.norm(qvd) * Similarity.norm(qq)))
        .orderBy(col("qcos").desc, col("vec_id"))
        .limit(80)
      cand
        .withColumn("cos", Similarity.cosine(col("e"), qe))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), round(col("cos"), 6).as("score"))
    }),

    // The IVF machinery in its EXACT-degeneration mode: nprobe = K and
    // every super-cell probed, which SimilaritySpec pins ≡ the exact NN
    // join — so the whole IVF code path (two-level routed assignment,
    // posexplode membership/probes, cell equi-join, map-side argmax) runs
    // under the q29 DuckDB oracle, hash-checked. q33 runs the REAL
    // approximation dial (nprobe < K, partial super probe) under its own
    // oracle via seed centroids + seed supers; only TRAINED centroids
    // (driver k-means) stay spec-side. Same plan shape as q33 — this is
    // a correctness harness for the scale path, not a second algorithm.
    "q74_ivf_exact" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val (k, _) = Similarity.ivfParams(emb)
      val cents = Similarity.trainCentroids(emb, "embedding", "vec_id", k = k)
      val (superK, _) = Similarity.routingParams(cents.length)
      val (sup, kids) = Similarity.trainSuperCells(cents, superK)
      Similarity.ivfNnJoin(emb, "embedding", "vec_id", cents, nprobe = cents.length,
        routing = Some((sup, kids, sup.length)))
    }),

    // The PERSISTED-IVF contract under a hash oracle — q74's trick
    // applied to the stored index ([[Similarity.buildIvfIndex]]): build
    // on the even half (train-once centroids + bucketed cell
    // assignments as catalog tables), probe the odd half at nprobe = K.
    // Probing every stored cell makes the candidate set the full stored
    // corpus, so centroid quality drops out and the result is exactly
    // the brute-force odd→even argmax DuckDB restates — the entire
    // stored path (centroid round trip, bucketed cell join, argmax)
    // runs hash-checked. The approximation dial (nprobe < K) and the
    // append/idempotency/torn-recovery contract are SimilaritySpec's.
    "q101_ivf_index_probe" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val name = s"g101_ivf_$sf"
      val emb = Tables(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 2 === 0)
      val batch = emb.filter(col("vec_id") % 2 === 1)
      val (k, _) = Similarity.ivfParams(corpus)
      val cents = Similarity.buildIvfIndex(corpus, "embedding", "vec_id", name, k = k)
      Similarity.probeIvfIndex(batch, "embedding", "vec_id", name, nprobe = cents.length)
    }),

    // Corpus-level top-100 bigrams by occurrence: explode → count with
    // map-side partial aggregation (the shuffle carries one row per
    // distinct gram per partition, not one per occurrence) → TakeOrdered
    // (per-partition top-k heap + driver merge, no global sort). The
    // canonical vocabulary/statistics pass of a training-data pipeline.
    //
    // The word array is MATERIALIZED in its own projection before the
    // bigram lambda touches it: a lambda that references a non-trivial
    // outer expression (like split()) re-evaluates it per array element —
    // measured 5× on this query. zip_with(ws, tail) pads the final element
    // with null, concat propagates it, and the null bigram never reaches
    // the explode (explode drops nothing — the concat null is filtered).
    "q37_top_ngrams" -> ((s, dir) => {
      val ws = col("ws")
      val bigrams = zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      Tables(s, dir, "documents")
        .select(Dedup.words(col("text")).as("ws"))
        .select(explode(bigrams).as("bigram"))
        .filter(col("bigram").isNotNull)
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(100)
    }),

    // End-to-end curation pipeline — the flagship composition of the
    // training-data operators: score every document map-side (quality +
    // language-ID + token count, one projection, zero shuffles), keep
    // high-quality English, collapse exact duplicates (ONE min_by shuffle
    // on the content key), then per-source-label accounting. The only
    // exchanges in the whole plan are the dedup group-by and the final
    // |langs|-sized aggregate — at 100 TB the scored filter runs inside
    // the scan stage and drops most of the corpus before anything wide.
    "q44_curation" -> ((s, dir) => {
      // The whole decision path is integer arithmetic: qualityMicro is
      // exact integer micro-units (no per-row double ever feeds the
      // `>= 750000` filter — a double `>= 0.75` flips membership on
      // threshold rows with 1-ulp engine differences, the driver-red of
      // rounds 4-5), the bigint sum is order-independent, and
      // (2S + n) div (2n) is round-half-up of S/n without any float op.
      // The output is now ALL BIGINT (avg_quality_micro stays in integer
      // micro-units — no double anywhere in the result), so a hash
      // divergence cannot come from float formatting either. q44a/q44b
      // below register the decomposition stages separately to localize
      // any remaining divergence to a specific cell.
      curationSurvivors(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("group_size")).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("q_mu")).as("__sq"))
        .withColumn("avg_quality_micro",
          expr("(__sq * 2 + n_unique) div (n_unique * 2)"))
        .drop("__sq")
    }),

    // q44 stage A: the same per-lang aggregation with NO derived column —
    // raw integer sums only. If q44 diverges while this is green, the
    // divergence lives in the round-half-up average cell alone.
    "q44a_curation_sums" -> ((s, dir) => {
      curationSurvivors(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("group_size")).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("q_mu")).as("sum_q_mu"))
    }),

    // q44 stage B: the survivor SET itself — per-document filter + dedup
    // outcome with the per-row integer ingredients. If q44 diverges while
    // this is green, the divergence is in aggregation, not membership.
    "q44b_curation_survivors" -> ((s, dir) => {
      curationSurvivors(s, dir)
        .select(col("doc_id"), col("lang"), col("group_size"),
          col("n_tokens"), col("q_mu"))
    }),

    // Winnowing fingerprints (rolling k-gram hash + per-window min): the
    // substring-overlap detector. Each stage is materialized in its own
    // projection so every lambda dereferences an attribute, never an
    // inlined expression (the q37 lesson) — the whole thing stays one
    // map-side pass, no shuffle until the final accounting.
    "q46_winnow_fingerprints" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.gramHashes(col("ws"), k = 3).as("hs"))
        .select(col("doc_id"), TextAnalysis.winnow(col("hs"), w = 4).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          to_json(col("fps")).as("fps"))
    }),

    // Substring-overlap pairs: documents sharing >= 3 winnow fingerprints
    // (i.e. >= 3 selected common word runs). Inverted-index shape: explode
    // fingerprints, self-equi-join on the fingerprint, count per pair —
    // the shuffle is bounded by docs × fingerprints (~grams/w), never
    // all-pairs. Stop-fingerprints (boilerplate runs shared by more than
    // maxDocsPerFp documents — the m²-bucket skew of crawl corpora) are
    // dropped inside winnowPostings with an observed count; the oracle
    // mirrors the same cap, so the query stays hash-checked.
    "q47_overlap_pairs" -> ((s, dir) => {
      // winnowPostings repartitions on the fingerprint, and BOTH join
      // sides derive from the same subtree: ReuseExchange computes the
      // winnow pipeline once, and the rename projections preserve the
      // partitioning (alias-aware), so the self-join adds no further
      // shuffle.
      val fps = TextAnalysis.winnowPostings(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 3, w = 4, maxDocsPerFp = 256)
      fps.select(col("fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("fp").as("fp_b"), col("doc_id").as("id_b")),
          col("fp") === col("fp_b") && col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
    }),

    // Train/eval decontamination: flag TRAINING documents that share a
    // winnow fingerprint (i.e. a selected common word run) with any EVAL
    // document — the benchmark-leakage scan every training corpus needs.
    // The eval fingerprint set is deduplicated and typically orders of
    // magnitude smaller than the corpus, so the probe is a broadcast-able
    // LEFT SEMI join against the training side's single scan; output is
    // per-flagged-doc hit counts. (Splits here are doc_id parity — a demo
    // stand-in for real train/eval tables.) Stop-fingerprints are dropped
    // by winnowPostings BEFORE the split: boilerplate shared corpus-wide
    // is not benchmark leakage, and it is also what makes the explode
    // output skewed — the cap bounds both.
    "q50_decontamination" -> ((s, dir) => {
      val fps = TextAnalysis.winnowPostings(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 3, w = 4, maxDocsPerFp = 256)
      val train = fps.filter(col("doc_id") % 2 === 0)
      val evalFps = fps.filter(col("doc_id") % 2 === 1)
        .select(col("fp")).distinct()
      train.join(broadcast(evalFps), Seq("fp"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("fp")).as("n_contaminated"))
    }),

    // Duplicate-CLUSTER assignment: the pairs→clusters closure every dedup
    // pipeline ends with. Edges are the hash-verified q16 MinHash pairs;
    // min-label propagation (join + group-by-min per round, lineage
    // truncated per round) converges in O(cluster diameter) rounds — dense
    // near-dup clusters take 2–3. Output: every doc in a cluster with its
    // canonical representative (min doc_id) and cluster size — exactly the
    // join a keep-one-per-cluster curation step consumes. The oracle
    // recomputes pairs by brute-force Jaccard and closes them with a
    // recursive CTE — fully independent restatement of both stages.
    "q58_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // The SAME closure on the alternating large-star/small-star algorithm
    // — O(log² n) rounds independent of component diameter, the true
    // 100 TB graph path (min-label propagation pays O(diameter) rounds).
    // Identical output contract, so the one recursive-CTE oracle
    // hash-checks BOTH implementations; DedupSpec additionally pins them
    // equal on chains/cliques/stars/random graphs.
    "q66_dup_clusters_bigstar" -> ((s, dir) => {
      val pairs = Dedup.minhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
      Dedup.connectedComponentsBigStar(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // The canonical near-dup REMOVAL pipeline end to end: LSH pairs →
    // connected-component clusters → keep one doc per cluster (the
    // cluster minimum) → per-source survivorship accounting. The cluster
    // table is orders of magnitude smaller than the corpus (only docs in
    // some near-dup pair), so the membership join is broadcast-able at
    // any scale; the keep rule is a null-tolerant predicate, no second
    // pass. Complements q44 (which collapses EXACT duplicates only).
    "q70_neardup_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
      val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("cluster_id"))
      docs.join(clusters, Seq("doc_id"), "left")
        .withColumn("keep",
          col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("n_dropped", col("n_docs") - col("n_kept"))
    }),

    // INCREMENTAL ingestion dedup — the production pattern: a new batch
    // (odd ids — a stand-in for today's crawl) deduped against the
    // existing corpus (even ids). Two passes in the production order:
    // (1) the cheap exact pass — a LEFT ANTI join of batch content keys
    // against the corpus key set (16-byte md5 keys, broadcast-able);
    // (2) the near-dup pass — the verified LSH pipeline over the union,
    // keeping only pairs that CROSS the batch/corpus boundary (within-
    // batch near-dups are a separate policy decision and deliberately
    // kept). Survivors = batch minus both drop sets. Exact dups are also
    // sim-1.0 LSH pairs, so the passes overlap by design — pass 1 exists
    // because at 100 TB it removes the (typically dominant) exact-dup
    // mass before any signature is computed.
    "q75_incremental_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 2 === 1)
      val corpusKeys = docs.filter(col("doc_id") % 2 === 0)
        .select(Dedup.contentKey(col("text")).as("ck")).distinct()
      val exactSurvivors = batch
        .withColumn("ck", Dedup.contentKey(col("text")))
        .join(corpusKeys, Seq("ck"), "left_anti")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
      val crossDropIds = pairs
        .filter(pmod(col("id_a"), lit(2)) =!= pmod(col("id_b"), lit(2)))
        .select(when(col("id_a") % 2 === 1, col("id_a")).otherwise(col("id_b"))
          .as("doc_id"))
        .distinct()
      exactSurvivors
        .join(crossDropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"))
    }),

    // The PRODUCTION-shape incremental dedup: q75's contract (same
    // corpus/batch split, same survivors) but O(batch) per increment —
    // the corpus signature pass runs ONCE into a persisted, bucketed LSH
    // index (content keys, band buckets, signatures, each bucketed on its
    // join key), and the batch probe equi-joins the stored artifacts:
    // batch-only signatures, candidate join against the index, agreement
    // prefilter on the STORED sigs, exact verify re-fetching corpus text
    // for candidate ids alone. The in-query index build is a measurement
    // artifact of a self-contained registered query (like q68's writes);
    // PlanAssertSpec pins the probe plan to exactly one batch-side
    // MinHashShingles and zero corpus-side signature work. Day-over-day
    // maintenance is [[Dedup.appendToMinhashIndex]] (bucketed INSERT of
    // each day's accepted reps; probe-after-append ≡ probe-after-rebuild,
    // pinned by DedupSpec) — the index is built once, not per run.
    "q81_indexed_incremental_dedup" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      Dedup.buildMinhashIndex(corpus, "doc_id", "text", s"g81_idx_$sf",
        shingleK = 3, numHashes = 48, bands = 6)
      Dedup.probeMinhashIndex(corpus, batch, "doc_id", "text", s"g81_idx_$sf",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
        .select(col("doc_id"), col("source"))
    }),

    // Index COMPACTION under the hash oracle: q81's exact flow with
    // [[Dedup.compactMinhashIndex]] between build and probe — the
    // crash-safe distinct→temp→swap rewrite of all three stored tables
    // runs end-to-end and the probe over the compacted index must still
    // produce q75/q81's survivors bit-for-bit (shared oracle). The
    // duplicate-removal half of compaction (torn-append debris) and the
    // file-count reclaim are DedupSpec/SimilaritySpec territory; this
    // query pins that a compacted index is THE index.
    "q102_compacted_index_probe" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      Dedup.buildMinhashIndex(corpus, "doc_id", "text", s"g102_idx_$sf",
        shingleK = 3, numHashes = 48, bands = 6)
      Dedup.compactMinhashIndex(s, s"g102_idx_$sf")
      Dedup.probeMinhashIndex(corpus, batch, "doc_id", "text", s"g102_idx_$sf",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
        .select(col("doc_id"), col("source"))
    }),

    // Deterministic train/val/test split assignment — the reproducible
    // sharding every training corpus needs: bucket = md5(doc_id) mod 100
    // (content-independent, stable across runs/engines/cluster sizes, no
    // sampling state), 90/5/5 split. Pure map-side projection; at 100 TB
    // this is the partition key for the split-out writes. md5-derived so
    // the oracle recomputes every assignment.
    "q57_split_assign" -> ((s, dir) => {
      val bucket = pmod(Dedup.md5Long60(col("doc_id")), lit(100))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), bucket.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
    }),

    // Gopher-style repetition signals — the quality-filter family the
    // curation pipeline composes with: longest immediate word repeat
    // (max_run), most-frequent-word occupancy (top_word_frac), and
    // most-frequent-bigram occupancy (top_bigram_frac), plus the
    // thresholded `repetitive` flag. ONE map-side pass: each array stage
    // (split, sort, bigrams) is materialized in its own projection so the
    // run/boundary lambdas dereference attributes (the q37 CSE lesson);
    // mode counts come from max-run-of-sorted (no per-doc shuffle, no
    // explode). The oracle recomputes the modes with an INDEPENDENT
    // algorithm (distinct-element filter counts, not sorted runs).
    "q54_repetition" -> ((s, dir) => {
      val ws = col("ws")
      val bgRaw = zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
        .select(col("doc_id"), ws, array_sort(ws).as("sws"),
          filter(bgRaw, x => x.isNotNull).as("bg"))
        .select(col("doc_id"), ws, col("sws"), col("bg"),
          array_sort(col("bg")).as("sbg"))
        .select(col("doc_id"),
          size(ws).as("n_words"),
          TextAnalysis.maxRunLengthW(ws).as("max_run"),
          round(TextAnalysis.maxRunLengthW(col("sws")).cast("double") / size(ws), 6)
            .as("top_word_frac"),
          when(size(col("bg")) === 0, lit(0.0))
            .otherwise(round(
              TextAnalysis.maxRunLengthW(col("sbg")).cast("double") / size(col("bg")), 6))
            .as("top_bigram_frac"))
        .withColumn("repetitive",
          col("max_run") >= 5 || col("top_word_frac") > 0.2 ||
            col("top_bigram_frac") > 0.18)
    }),

    // Deterministic per-source stratified sample — fixed FRACTION per group
    // with exact group quotas: rank docs inside each source by an md5 hash
    // of the id (content-independent, reproducible on any engine/cluster),
    // keep the first ceil(0.2·|group|). One window shuffle on the group
    // key; the quota needs the exact group count, which is what separates
    // this from the shuffle-free hash-threshold split (q57) — that form
    // samples ≈20% per group, this one EXACTLY ceil(20%), the contract a
    // balanced eval-set draw needs. Skew note: a mega-group serializes its
    // window sort; at 100 TB prefer q57's thresholding unless exact quotas
    // are required.
    "q59_stratified_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hk = md5(col("doc_id").cast("string").cast("binary"))
      val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hk.as("hk"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        // ceil(0.2·n) as the INTEGER (n + 4) div 5 — the quota boundary
        // never rides on an IEEE product (the q86 discipline)
        .filter(col("rn") <= expr("(n + 4) div 5"))
        .select(col("doc_id"), col("source"), col("rn").as("sample_rank"))
    }),

    // q59's exact-quota contract at MEGA-GROUP scale: the same sample —
    // same ranks, same rows, same oracle — without any single-partition
    // per-group sort. Range-bucketed order statistics: the md5 rank key's
    // first two hex chars split each group into 256 ranges whose
    // LEXICOGRAPHIC order equals their numeric order, so global rank =
    // (sum of earlier buckets' counts) + rank within the bucket — exact,
    // with the only row-level sorts partitioned (source, bucket) at
    // ~n/256 rows each, and the offset/count tables (|groups|·256 rows)
    // arriving as broadcasts. This is how a 100 TB group with one skewed
    // mega-source ranks without serializing it through one task; q59
    // stays registered as the simple-window reference implementation.
    "q83_stratified_sample_bucketed" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hk = md5(col("doc_id").cast("string").cast("binary"))
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hk.as("hk"))
        .withColumn("__bkt", conv(substring(col("hk"), 1, 2), 16, 10).cast("int"))
      val bkts = bucketOffsets(docs, Seq("source"), "__bkt", count(lit(1)))
      val counts = bkts.groupBy(col("source")).agg(sum(col("__bm")).as("n"))
      val offsets = bkts.select(col("source"), col("__bkt"), col("__off").as("off"))
      val wLocal = Window.partitionBy(col("source"), col("__bkt"))
        .orderBy(col("hk"), col("doc_id"))
      docs.withColumn("lr", row_number().over(wLocal))
        .join(broadcast(offsets), Seq("source", "__bkt"))
        .join(broadcast(counts), "source")
        // quota membership decides on the LONG rank (an int cast before
        // the filter would wrap negative past 2^31 rows per group and
        // admit out-of-quota rows); the emitted width is q59's int
        // contract, safe up to a 5·2^31-row group at the 20% quota
        .withColumn("rn", col("off") + col("lr"))
        .filter(col("rn") <= expr("(n + 4) div 5"))
        .select(col("doc_id"), col("source"),
          col("rn").cast("int").as("sample_rank"))
    }),

    // Exact distribution quantiles per source — the filter-threshold
    // selection pass (where should the length cutoff sit per domain?).
    // percentile_disc semantics in pure INTEGER rank arithmetic: the
    // p-quantile is the value at row ceil(p·n) of the (value, id)-sorted
    // group, with the thresholds THEMSELVES integer expressions
    // ((n+9) div 10, (n+1) div 2, (9n+9) div 10 — no IEEE product ever
    // touches the row selection, on either engine). Ranking is the q83
    // bucketed-order-statistics shape with bucket = the exact token
    // count, plus the within-value md5-prefix sub-split (see
    // tokenQuantiles) so even a degenerate corpus of identical counts
    // never serializes one window partition.
    "q86_token_quantiles" -> ((s, dir) => tokenQuantiles(s, dir, DefaultSubCap)),

    // Deterministic GLOBAL training-order shuffle — the corpus-ordering
    // step before sequence packing: every document gets its exact
    // position in md5(doc_id) order (content-independent, reproducible
    // on any engine/cluster, re-runnable mid-pipeline), with NO global
    // sort: the q83 bucketed order statistics degenerate-grouped to one
    // global group. The md5 prefix's 256 lexicographic=numeric ranges
    // give bucket offsets from a 256-row cumsum (driver-trivial window),
    // and the only row-level sorts are the per-bucket (hk, doc_id)
    // rank windows at ~n/256 rows each. At 100 TB this is how a corpus
    // gets one total order without one task ever seeing it all.
    "q90_corpus_shuffle" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hk = md5(col("doc_id").cast("string").cast("binary"))
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hk.as("hk"))
        .withColumn("__bkt", conv(substring(col("hk"), 1, 2), 16, 10).cast("int"))
      val offsets = bucketOffsets(docs, Nil, "__bkt", count(lit(1)))
        .select(col("__bkt"), col("__off").as("off"))
      val wLocal = Window.partitionBy(col("__bkt")).orderBy(col("hk"), col("doc_id"))
      docs.withColumn("lr", row_number().over(wLocal))
        .join(broadcast(offsets), "__bkt")
        .select(col("doc_id"), col("source"),
          (col("off") + col("lr")).as("shuffle_rank"))
    }),

    // Greedy token-budget corpus cut — the global form of q69's mixture
    // budgeting: keep the BEST documents (highest integer quality
    // micro-units, ties by content-independent md5 order) until 40% of
    // the corpus's tokens are spent; a document is kept iff the tokens of
    // all strictly-better documents leave budget. The global
    // quality-ordered cumulative sum never runs as one sort: bucket = the
    // exact q_mu value, sub-split by the md5-prefix ranges when one value
    // carries too much mass (see tokenBudgetCut) — row-level sorts
    // partitioned (q_mu, __sub), offsets and the 1-row budget broadcast.
    // Everything after tokenCount is integer arithmetic.
    "q91_token_budget_cut" -> ((s, dir) => tokenBudgetCut(s, dir, DefaultSubCap)),

    // Quality-PROPORTIONAL Bernoulli downsampling — between q57's uniform
    // split and q87's hard cap sits the soft lever corpus assembly
    // actually uses: keep each document with probability equal to its
    // quality score, so high-quality text survives at full rate and
    // boilerplate thins out without a cliff. Decision = pure integer
    // compare (md5-derived uniform in [0, 1e6) vs the exact micro-unit
    // score): content-independent reproducibility like q57, zero
    // shuffles, restatable on any engine with md5. Emits the survivor
    // set + the per-doc draw so the oracle checks the mechanism, not
    // just the set.
    "q92_weighted_sample" -> ((s, dir) => {
      val t = col("text")
      val ws = col("ws")
      val draw = pmod(Dedup.md5Long60(col("doc_id")), lit(1000000L))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), t, Dedup.words(t).as("ws"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityMicro(t, ws).as("q_mu"), draw.as("draw"))
        .filter(col("draw") < col("q_mu"))
    }),

    // Square-root TEMPERATURE source rebalancing — the multilingual-
    // corpus idiom (sample low-resource sources up, mega-sources down,
    // rates ∝ share^(1/T)) at T = 2, where the only transcendental is
    // sqrt — correctly-rounded IEEE on every engine, unlike pow/ln, so
    // the thresholds are bit-identical anywhere (the q44 lesson applied
    // BEFORE it bites). Shape: one |sources|-row token aggregate, the
    // corpus total as a 1-row broadcast, per-source keep threshold
    // floor(1e6·sqrt(share)) materialized as an INTEGER, inclusion by
    // the q92 integer draw — the scan-side decision joins a broadcast
    // threshold table and never shuffles the corpus.
    "q93_temperature_rebalance" -> ((s, dir) => {
      val t = col("text")
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(t).cast("long").as("n_tokens"))
      val bySource = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
      val tot = bySource.agg(sum(col("src_tokens")).as("__tot"))
      val thr = bySource.crossJoin(broadcast(tot))
        .withColumn("keep_thr",
          floor(sqrt(col("src_tokens").cast("double") / col("__tot").cast("double"))
            * 1000000.0).cast("long"))
        .select(col("source"), col("src_tokens"), col("keep_thr"))
      val draw = pmod(Dedup.md5Long60(col("doc_id")), lit(1000000L))
      docs.join(broadcast(thr), "source")
        .withColumn("draw", draw)
        .filter(col("draw") < col("keep_thr"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("keep_thr"), col("draw"))
    }),

    // CONDITIONAL bigram surprisal — the 2-gram step up from q67's
    // unigram proxy and the mechanism CCNet-style quality filtering
    // actually uses: each occurrence scores −ln P(w₂|w₁) with
    // P(w₂|w₁) = c(w₁w₂) / c(w₁·) (history count = bigrams starting
    // with w₁, so the conditional sums to 1 over observed successors).
    // Same float discipline as q67: the per-occurrence log is a fixed
    // IEEE expression on exact integer counts, quantized to integer
    // micro-nats BEFORE the per-doc sum, so the aggregate is partition-
    // order-independent. Shape: one explode, TWO vocabulary-sized keyed
    // count shuffles (bigram and history — joined back KEYED, not
    // broadcast: a 100 TB vocabulary outgrows any broadcast), one
    // per-doc aggregate. Documents under two words carry no bigram and
    // drop out, exactly as in the oracle.
    "q94_bigram_surprisal" -> ((s, dir) => {
      val ws = col("ws")
      // the q37 bigram idiom (materialized ws, zip_with against the
      // shifted tail, null padding filtered) carrying the history word
      val pairs = zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg")))
      val occ = Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
        .filter(size(ws) >= 2)
        .select(col("doc_id"), explode(pairs).as("o"))
        .filter(col("o.bg").isNotNull)
        .select(col("doc_id"), col("o.w1").as("w1"), col("o.bg").as("bg"))
      val cb = occ.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      val ch = occ.groupBy(col("w1")).agg(count(lit(1)).as("ch"))
      occ.join(cb, "bg").join(ch, "w1")
        .withColumn("s_mu",
          round(-log(col("cb").cast("double") / col("ch").cast("double")) * 1e6)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("s_mu")).as("ssum"))
        .select(col("doc_id"), col("n_bigrams"),
          round((col("ssum").cast("double") / col("n_bigrams")) / 1e6, 6)
            .as("avg_bigram_surprisal"))
    }),

    // Embedding-cosine near-dup REMOVAL end-to-end — the last member of
    // the dedup family (exact q15 / MinHash q16 / SimHash q36 / Jaccard
    // q17 / embedding-cosine here): banded hyperplane-LSH candidates →
    // exact-cosine verify → connected components → keep min id per
    // cluster. The corpus has no natural near-dup vectors (max pair
    // cosine ≈ 0.6), so the query plants them deterministically: every
    // vec_id % 7 == 0 vector gets a clone (id + 1_000_000) with ONE
    // coordinate (index vec_id % 64) scaled by 1.0625 — a pure-IEEE
    // double product both engines compute bit-identically — giving
    // planted pair cosines ≥ 0.9997 against a 0.8 threshold (no
    // borderline comparisons anywhere). HASH-CHECKED against a DuckDB
    // oracle that brute-forces ALL pair cosines and runs recursive-CTE
    // components: the LSH banding must find exactly the brute-force
    // pair set (the q16 contract; deterministic md5 planes, so recall
    // on this corpus is a constant — SimilaritySpec pins it at 1.0).
    // Cross-document chunk dedup — the boilerplate-removal pass (CCNet
    // paragraph dedup / RefinedWeb repeated-line filter, adapted to this
    // corpus's flat word stream): drop 3-word chunk instances occurring
    // in >= 3 distinct documents; per-doc counts plus the md5 of the
    // kept chunks in original order. Everything is exact string/integer
    // work, so the oracle restates it directly.
    "q96_chunk_dedup" -> ((s, dir) =>
      TextAnalysis.chunkDedup(Tables(s, dir, "documents"), "doc_id", "text",
        k = 3, minDocs = 3)),

    // Persisted cosine-LSH index + O(batch) probe — q81's amortized
    // incremental-ingestion contract on the embedding surface. The
    // corpus (original vectors) pays its signature pass once into two
    // bucketed tables; the batch (the q95 planted clones) probes by
    // band equi-join and verifies against candidate-sized unit-vector
    // point lookups, never rescanning the corpus (plan-asserted).
    // HASH-CHECKED: the oracle brute-forces every batch × corpus cosine,
    // so banding recall must be exactly 1.0 (the q16/q95 contract).
    "q97_indexed_embedding_neardup" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val corpus = embCloneCorpus(s, dir).filter(col("vec_id") < 1000000L)
      val batch = embCloneCorpus(s, dir).filter(col("vec_id") >= 1000000L)
      Similarity.buildCosineIndex(corpus, "emb", "vec_id", s"g97_idx_$sf", dim = 64)
      Similarity.probeCosineIndex(batch, "emb", "vec_id", s"g97_idx_$sf",
          dim = 64, threshold = 0.8)
        .select(col("id_b").as("vec_id"), col("id_a").as("match_id"), col("cos"))
    }),

    // The q82/q89 recall-artifact pattern for the COSINE index — but
    // HASH-CHECKED, which the IVF artifacts (driver k-means) can never
    // be: the cosine-LSH pipeline is fully deterministic (md5 planes),
    // and q95/q97 pin its banding recall at exactly 1.0 on this corpus,
    // so the artifact's expected value is itself restatable. The exact
    // side is the brute-force batch × corpus pair set
    // ([[Similarity.crossPairsAbove]] — the audit cost, q82's pattern;
    // at 100 TB dial it down by md5-sampling the batch, the q89 move);
    // the measured side re-probes the stored q97-layout index. One
    // missed pair ⇒ n_found < n_true_pairs ⇒ hash-red — a recall
    // regression fails the driver gate instead of degrading silently.
    "q103_cosine_recall" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val name = s"g103_idx_$sf"
      val corpus = embCloneCorpus(s, dir).filter(col("vec_id") < 1000000L)
      val batch = embCloneCorpus(s, dir).filter(col("vec_id") >= 1000000L)
      Similarity.buildCosineIndex(corpus, "emb", "vec_id", name, dim = 64)
      val found = Similarity.probeCosineIndex(batch, "emb", "vec_id", name,
          dim = 64, threshold = 0.8)
        .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
      Similarity.crossPairsAbove(corpus, batch, "emb", "vec_id", 0.8)
        .join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true_pairs"),
          coalesce(sum(col("hit")), lit(0L)).as("n_found"))
        .withColumn("recall_permille",
          expr("(n_found * 2000 + n_true_pairs) div (n_true_pairs * 2)"))
    }),

    // The maintenance-observability artifact — registers what was
    // spec-only in round 8 (storedBucketStats, CompactStats) under the
    // driver's hash gate. Full lifecycle on the persisted IVF index with
    // SEED centroids (the q82 move — every assignment SQL-restatable):
    // build over the even ids, append the odd ids (nearest STORED
    // centroid), replay a partial append of the id%3 slice — the
    // duplicate-row crash artifact a torn two-table-family append leaves,
    // written with the writer's own deterministic rows — then compact.
    // Emits the numbers a maintenance dashboard alerts on: rows
    // before/after/dropped (compaction's distinct() must drop EXACTLY the
    // replayed slice), occupied-cell stats over the compacted table
    // (buckets / max_bucket_rows / oversized at cap 64 — the stored-skew
    // alert), and the small-files flag (compaction strictly reduced file
    // count; the exact file total is layout-dependent, the direction is
    // the contract).
    "q105_index_maintenance_stats" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val name = s"g105_idx_$sf"
      val emb = Tables(s, dir, "embeddings")
      val (cents, _) = Similarity.seedCentroids(emb, "embedding", "vec_id")
      Similarity.buildIvfIndexWith(emb.filter(col("vec_id") % 2 === 0),
        "embedding", "vec_id", name, cents)
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1),
        "embedding", "vec_id", name)
      graft.sources.Sources.writeBucketed(
        Similarity.cellAssignments(emb.filter(col("vec_id") % 3 === 0),
          "embedding", "vec_id", cents),
        s"${name}_cells", Seq("cell"), 16,
        org.apache.spark.sql.SaveMode.Append)
      val stats = Similarity.compactIvfIndex(s, name).head
      Dedup.storedBucketStats(s, s"${name}_cells", Seq("cell"), maxBucketSize = 64)
        .select(
          lit(stats.rowsBefore).as("rows_before"),
          lit(stats.rowsAfter).as("rows_after"),
          lit(stats.rowsBefore - stats.rowsAfter).as("rows_dropped"),
          col("buckets"), col("max_bucket_rows"), col("oversized_buckets"),
          lit(stats.filesBefore > stats.filesAfter).as("files_reclaimed"))
    }),

    // Payload-file round trip through the binaryFile source — the
    // multimodal shard layout exercised end to end: a deterministic
    // subset of documents exports one `<id>.bin` payload file per row
    // (distributed foreachPartition write, no driver round-trip), then
    // re-ingests the directory as opaque binaries and emits the id parsed
    // from the path, the byte length, and the payload md5. HASH-CHECKED:
    // the oracle recomputes length/md5 from the source table directly, so
    // a torn export, a truncated file, or an encoding drift in the write
    // path is hash-red. At 100 TB the dir is object storage and the same
    // plan shape holds (binaryFile prunes `content` when only metadata is
    // projected).
    "q106_binaryfile_ingest" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      // Scratch root under the SHARED warehouse (not java.io.tmpdir, which
      // is node-local: on a multi-node deployment executors would write
      // their own /tmp while the listing reads the driver's). The
      // warehouse is Hadoop-addressable by every task, and the pre-clean
      // goes through the same FileSystem API as the writes.
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        s"graft_q106_$sf")
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val docs = Tables(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      Multimodal.exportPayloads(docs, "doc_id", col("text").cast("binary"),
        outRoot.toString)
      // `-?` keeps a negative id's sign through the round trip; `*.bin`
      // glob keeps crashed-attempt tmp files out of the listing
      Multimodal.readPayloadDir(s, outRoot.toString, glob = Some("*.bin"))
        .select(
          regexp_extract(col("path"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("payload_md5"))
    }),

    // Sharded payload round trip — q106's contract through the
    // WebDataset-style layout: size-capped tar shards written per
    // partition (the billions-of-tiny-payloads answer — shard size, not
    // shard count, scales with the data), then streamed back entry by
    // entry and restated against the source table. The 64 KB cap forces
    // multiple shards per partition at test scale so the roll boundary is
    // actually exercised; a torn shard, a dropped entry, or a byte drift
    // in the tar framing is hash-red. HASH-CHECKED (same oracle shape as
    // q106, different doc subset).
    "q107_shard_ingest" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        s"graft_q107_$sf")
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val docs = Tables(s, dir, "documents").filter(col("doc_id") % 10 === 5)
      Multimodal.exportPayloadShards(docs, "doc_id", col("text").cast("binary"),
        outRoot.toString, maxShardBytes = 64L << 10)
      Multimodal.readPayloadShards(s, outRoot.toString)
        .select(
          regexp_extract(col("name"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("payload_md5"))
    }),

    // Best-representative selection — the production dedup policy: a
    // near-dup cluster keeps its HIGHEST-QUALITY member (exact integer
    // micro-units, ties to the smaller id), not the min-id one that
    // q70's survivorship uses. Pairs + components as q58/q70; the rep
    // choice is ONE map-side-combining max_by group-by keyed by cluster
    // (the shuffle carries one surviving candidate per cluster per
    // partition, never the membership lists). Fully restated by the
    // oracle: recursive-CTE components + the shared q_mu fragment +
    // a per-cluster argmax window.
    // Curation FUNNEL provenance — "where did my data go": per source,
    // the document and token counts surviving each pipeline stage
    // (raw → quality gate → language gate → exact-dup survivor), computed
    // in ONE scan with stage flags instead of re-running the pipeline
    // per stage. The survivor flag rides the same content-key window the
    // dedup uses, ordered pass-first so the kept row per group is exactly
    // q44's survivor. At 100 TB this is the retention dashboard a
    // curation run publishes — and a silent filter regression (a stage
    // suddenly dropping 30% more) moves a cell and goes hash-red.
    "q112_curation_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = col("text")
      val ws = col("ws")
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), t, Dedup.words(t).as("ws"))
        .select(col("doc_id"), col("source"), t, ws,
          TextAnalysis.qualityMicro(t, ws).as("q_mu"),
          TextAnalysis.langIdW(ws).as("lang_guess"),
          TextAnalysis.tokenCount(t).as("n_tokens"))
        .withColumn("pass_q", col("q_mu") >= 750000L)
        .withColumn("pass_lang", col("pass_q") && col("lang_guess") === "en")
        .withColumn("__key", Dedup.contentKey(t))
      val w = Window.partitionBy(col("__key"))
        .orderBy(col("pass_lang").desc, col("doc_id"))
      scored
        .withColumn("survivor", col("pass_lang") && row_number().over(w) === 1)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("pass_q"), 1)).as("n_quality"),
          count(when(col("pass_lang"), 1)).as("n_lang"),
          count(when(col("survivor"), 1)).as("n_unique"),
          sum(col("n_tokens")).as("tokens_in"),
          coalesce(sum(when(col("survivor"), col("n_tokens"))), lit(0L))
            .as("tokens_kept"))
    }),

    // Unicode NFC normalization at the ingestion boundary — the
    // prerequisite for every byte-keyed text operator: canonically
    // equivalent strings ("é" precomposed vs "e"+U+0301) hash to
    // DIFFERENT dedup keys until normalized. A planted suffix gives every
    // third doc the decomposed form: the raw md5 key space holds two
    // classes per lang, the NFC'd space exactly one, and the full-text
    // md5s pin byte-exact NFC agreement between the codegen'd JVM
    // expression and DuckDB's utf8proc implementation. Fast path: already-
    // NFC input returns the input object, no allocation.
    "q122_unicode_normalize" -> ((s, dir) => {
      import graft.expr.NfcNormalize
      val suf = when(col("doc_id") % 3 === 0, lit("Cafe\u0301"))
        .otherwise(lit("Caf\u00e9"))
      Tables(s, dir, "documents")
        .select(col("lang"), col("text"), suf.as("suf"))
        .select(col("lang"), col("suf"),
          NfcNormalize.column(col("suf")).as("sufn"),
          NfcNormalize.column(concat(col("text"), lit(" "), col("suf")))
            .as("docn"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("sufn") =!= col("suf"), 1)).as("n_denorm"),
          count_distinct(md5(col("suf").cast("binary"))).as("distinct_raw_keys"),
          count_distinct(md5(col("sufn").cast("binary"))).as("distinct_norm_keys"),
          count_distinct(md5(col("docn").cast("binary"))).as("distinct_docs"))
    }),

    // Grouped top-k via the typed Aggregator (ops.TopKAgg) — per-source
    // top-3 documents by exact quality, WITHOUT a window: the k-row
    // buffer combines map-side, so the shuffle carries at most k rows per
    // source per partition and no group is ever sorted (the window form
    // sorts every group in full — the skew-prone mega-group shape q83/q86
    // work to avoid). The oracle computes the same top-3 with the window
    // form, so the Aggregator's insert/merge path is hash-checked against
    // the reference semantics including ties (score DESC, id ASC).
    "q120_grouped_topk" -> ((s, dir) => {
      import graft.ops.{ScoredId, TopKAgg}
      val topk = udaf(new TopKAgg(3), Encoders.product[ScoredId])
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          Dedup.words(col("text")).as("ws"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityMicro(col("text"), col("ws")).as("q_mu"))
        .groupBy(col("source"))
        .agg(topk(col("q_mu"), col("doc_id")).as("t"))
        .select(col("source"),
          posexplode(arrays_zip(col("t.scores").as("s"), col("t.ids").as("i"))))
        .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
          col("col.i").as("doc_id"), col("col.s").as("q_mu"))
    }),

    "q99_cluster_best_rep" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 48, bands = 6, threshold = 0.9)
      val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("cluster_id"))
      val scored = docs
        .select(col("doc_id"), col("text"), Dedup.words(col("text")).as("ws"))
        .select(col("doc_id"),
          TextAnalysis.qualityMicro(col("text"), col("ws")).as("q_mu"))
      clusters.join(scored, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(
          max_by(struct(col("doc_id"), col("q_mu")),
            struct(col("q_mu"), -col("doc_id"))).as("m"),
          count(lit(1)).as("cluster_size"))
        .select(col("cluster_id"), col("m.doc_id").as("keep_id"),
          col("m.q_mu").as("keep_q_mu"), col("cluster_size"))
    }),

    "q95_embedding_neardup_dedup" -> ((s, dir) => {
      val corpus = embCloneCorpus(s, dir)
      val pairs = Similarity.cosineNearDupPairs(corpus, "emb", "vec_id",
        threshold = 0.8, dim = 64)
      val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("node").as("vec_id"), col("cluster_id"))
      corpus.join(clusters, Seq("vec_id"), "left")
        .withColumn("keep",
          col("cluster_id").isNull || col("cluster_id") === col("vec_id"))
        .groupBy(pmod(col("vec_id"), lit(10L)).as("shard"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("n_dropped", col("n_vecs") - col("n_kept"))
    }),

    // Per-source document cap — the per-domain cap of a crawl curation
    // pipeline: keep at most K best documents per source, best = highest
    // integer quality micro-units, ties broken by id. Deterministic
    // everywhere (the rank key is (exact integer, unique id)); the
    // window is per-source and the K-row tail is all that survives, so
    // at scale this is the q83 bucketed-ranking shape with quota = K.
    "q87_source_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = col("text")
      val ws = col("ws")
      val w = Window.partitionBy(col("source"))
        .orderBy(col("q_mu").desc, col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), t, Dedup.words(t).as("ws"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityMicro(t, ws).as("q_mu"))
        .withColumn("rank_in_source", row_number().over(w))
        .filter(col("rank_in_source") <= 15)
    }),

    // Corpus TF-IDF: top-3 highest-scoring terms per document — see
    // [[TextAnalysis.tfidfTopTerms]] for the keyed-shuffle shape.
    "q60_tfidf_terms" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables(s, dir, "documents"), "doc_id", "text", k = 3)),

    // Sliding-window passage chunking: 32-word windows advancing by 24
    // (8-word overlap) — see [[TextAnalysis.chunkPassages]].
    "q62_passages" -> ((s, dir) =>
      TextAnalysis.chunkPassages(Tables(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)),

    // Sequence packing: fixed 512-token training sequences over 8
    // md5-derived shards — see [[TextAnalysis.packSequences]].
    "q63_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(Tables(s, dir, "documents"), "doc_id", "text",
        budget = 512, shards = 8)),

    // Per-label centroid cohesion — the embedding-space cluster audit: how
    // close each vector sits to its class centroid (low cohesion = label
    // noise / outlier candidates). Centroid components are EXACT integer
    // micro-sums (posexplode → one (label, pos) shuffle with map-side
    // partial sums — element-wise array aggregation with no float
    // order-dependence, the q44/q61 discipline), assembled into an array
    // per label (sorted by position, so collect_list's order freedom
    // cancels) and broadcast back onto the scan; cosine is scale-invariant
    // so the raw integer sums serve as the centroid without any division.
    // Per-row cosine is the codegen'd index-order DotProduct — the same
    // fixed IEEE summation the oracle restates. At 100 TB: the exploded
    // shuffle carries n·dim skinny rows with partial aggregation, the
    // |labels|×dim centroid table is kilobytes, the join is broadcast.
    "q64_label_cohesion" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = emb
        .select(col("label"), posexplode(Similarity.toDouble(col("embedding"))))
        .select(col("label"), col("pos"),
          round(col("col") * 1e6).cast("long").as("v"))
        .groupBy(col("label"), col("pos")).agg(sum(col("v")).as("sv"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          s => s.getField("sv").cast("double")).as("c"))
      emb.select(col("vec_id"), col("label"),
          Similarity.toDouble(col("embedding")).as("e"))
        .join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(col("e"), col("c")), 6).as("cohesion"))
    }),

    // Corpus-statistics quality scoring: mean unigram SURPRISAL per
    // document (−ln of each word's corpus frequency) — the cheap
    // language-model proxy that flags gibberish (high surprisal) and
    // boilerplate (low) where the doc-local signals (q20/q54) cannot see
    // corpus context. Shape: corpus term frequencies in one keyed shuffle
    // with map-side partial counts; the 1-row token total broadcast; each
    // occurrence's surprisal quantized to integer micro-nats BEFORE the
    // per-doc aggregation, so the per-doc sum is order-independent (the
    // q44/q61 discipline — per-word ln is a fixed IEEE expression, but a
    // double SUM of them would depend on partition order); one final
    // per-doc shuffle. At 100 TB the vocabulary never leaves the
    // executors and every exchange is keyed.
    "q67_surprisal" -> ((s, dir) => {
      val terms = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(Dedup.words(col("text"))).as("term"))
      val tf = terms.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
      // total occurrences = Σ|words| computed map-side off the scan — same
      // value as Σctf without re-running the explode+aggregate subtree
      val tot = Tables(s, dir, "documents")
        .agg(sum(size(Dedup.words(col("text")))).as("n_tot"))
      terms.join(tf, "term")
        .crossJoin(broadcast(tot))
        .withColumn("s_mu",
          round(-log(col("ctf").cast("double") / col("n_tot").cast("double")) * 1e6)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("s_mu")).as("ssum"))
        .select(col("doc_id"), col("n_words"),
          round((col("ssum").cast("double") / col("n_words")) / 1e6, 6)
            .as("avg_surprisal"))
    }),

    // Data-MIXTURE budgeting — the source-weighting step of corpus
    // assembly: score every source by mean quality (exact integer
    // micro-units, the q44 round-half-up formula), rank sources best
    // first, and allocate a global token budget (60% of the corpus) down
    // the ranking — full allocation while it lasts, the boundary source
    // pro-rated, the tail excluded. The scan-side work is one map-side
    // scoring pass + one |sources|-sized aggregation; the ranking window
    // runs over the AGGREGATED rows (|sources|, not docs — a global
    // window is fine after cardinality collapse), and the corpus total
    // arrives as a broadcast 1-row aggregate. Everything downstream of
    // the quality rounding is integer arithmetic — engine-independent.
    "q69_mixture" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = col("text")
      val ws = col("ws")
      val scored = Tables(s, dir, "documents")
        .select(col("source"), t, Dedup.words(t).as("ws"))
        .select(col("source"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          TextAnalysis.qualityMicro(t, ws).as("q_mu"))
      val agg = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("q_mu")).as("__sq"))
        .withColumn("q_mean",
          expr("(__sq * 2 + n_docs) div (n_docs * 2)").cast("double") / 1e6)
      val tot = agg.agg(sum(col("sum_tokens")).as("__tot"))
      val w = Window.orderBy(col("q_mean").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
      agg.crossJoin(broadcast(tot))
        .withColumn("__budget", expr("(__tot * 6) div 10"))
        .withColumn("__cum", coalesce(sum(col("sum_tokens")).over(w), lit(0L)))
        .withColumn("alloc_tokens",
          greatest(lit(0L), least(col("sum_tokens"), col("__budget") - col("__cum"))))
        .select(col("source"), col("n_docs"), col("sum_tokens"), col("q_mean"),
          col("alloc_tokens"), (col("alloc_tokens") > 0).as("included"))
    }),

    // The SQL-TEXT surface: the same engine driven entirely through
    // `spark.sql(...)` with the custom expressions resolved from the
    // function registry (GraftExtensions via the live-session installer)
    // — a reference user's SQL-first workflow is first-class, not a
    // DataFrame-only API. stopword_hits is the codegen'd vocabulary
    // counter; the signature is the md5-family SimHash built from plain
    // SQL building blocks around simhash_bits — both independently
    // restated by the oracle (list_filter count; the q21 bit formula).
    "q73_sql_surface" -> ((s, dir) => {
      org.apache.spark.sql.GraftBridge.installFunctions(
        s, new graft.expr.GraftExtensions())
      Tables(s, dir, "documents").createOrReplaceTempView("g73_docs")
      s.sql("""
        SELECT doc_id,
          stopword_hits(split(trim(lower(text)), '\\s+'),
            array('the','a','and','of','to','in','is','it','for','on')) AS en_hits,
          simhash_bits(
            transform(array_distinct(split(trim(lower(text)), '\\s+')),
              w -> cast(conv(substring(md5(cast(w AS binary)), 1, 15), 16, 10) AS bigint)),
            60) AS sig
        FROM g73_docs""")
    }),

    // Strided frame sampling over the binary payload — the "every Nth
    // frame" decode-prep pattern with REAL plumbing: native byte slices
    // (no UDF, no codec), one explode, payload never shuffled; emitted as
    // hex fingerprints. The oracle re-slices the same bytes in DuckDB, so
    // the byte-level frame geometry is hash-checked end to end.
    "q77_frame_sample" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          posexplode(Multimodal.frameSample(col("payload"), frameSize = 16, stride = 48)))
        .select(col("doc_id"), col("pos").as("frame_idx"),
          hex(col("col")).as("frame_hex"))
    }),

    // Decode-stub path: mapPartitions feature extraction. The stub's fake
    // features are md5/length arithmetic over the payload bytes, so the
    // oracle recomputes them from the same text — HASH-CHECKED, proving
    // the mapPartitions boundary (the real codec's seam) round-trips
    // every row unchanged.
    "q23_multimodal_decode" -> ((s, dir) => {
      val df = Multimodal.withMedia(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        col("text").cast("binary"), "text/plain")
        .select(col("doc_id"), col("media.payload").as("payload"))
      Multimodal.decodeStub(df, "payload")
        .select(col("doc_id"), col("features.width").as("width"),
          col("features.height").as("height"), col("features.n_frames").as("n_frames"))
    }))

  /** The shared scaffold of the bucketed-order-statistics family (q83 /
    * q86 / q90 / q91): per `partitionCols` group, aggregate `measure`
    * over each `bucketCol` bucket and attach the bucket's EXCLUSIVE
    * running total in bucket order — `__bm` is the bucket's own measure,
    * `__off` the total of all earlier buckets. The result is AGGREGATED
    * (|groups|·|buckets| rows): callers broadcast-join it back onto the
    * row stream, add their own bucket-partitioned local window (rank or
    * running sum), and derive group totals by re-summing `__bm` — which
    * reuses this aggregation's exchange instead of paying a second
    * corpus scan. This is how an exact global/grouped order statistic is
    * computed at 100 TB with every row-level sort partitioned by
    * (group, bucket) and no mega-group window anywhere.
    */
  private def bucketOffsets(docs: DataFrame, partitionCols: Seq[String],
                            bucketCol: String, measure: Column,
                            desc: Boolean = false,
                            extra: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pcols = partitionCols.map(col)
    val wOff = Window.partitionBy(pcols: _*)
      .orderBy(if (desc) col(bucketCol).desc else col(bucketCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.groupBy(pcols :+ col(bucketCol): _*).agg(measure.as("__bm"), extra: _*)
      .withColumn("__off", coalesce(sum(col("__bm")).over(wOff), lit(0L)))
  }

  /** Sub-split factor for an exact-value bucket whose row mass exceeds the
    * per-partition window-input discipline: the next power of two above
    * mass/cap, capped at 256 (the q83 md5-prefix range count). A power of
    * two dividing 256 makes the sub-bucket id a PREFIX-RANGE of the md5
    * head (`__hx div (256 div __ns)`), so ordering by (__sub, hk, id)
    * equals ordering by (hk, id) — the split never changes the merged
    * order, whatever __ns the data produces. The double-valued log/pow
    * here only picks a partitioning fan-out; no output value rides on it.
    */
  private def pow2Subs(mass: Column, cap: Long): Column =
    least(lit(256), pow(lit(2.0),
      ceil(log(2.0, greatest(lit(1.0), mass.cast("double") / lit(cap.toDouble))))).cast("int"))

  /** Per-partition window-input discipline for the exact-value-bucketed
    * order statistics (q86/q91): a value bucket holding more rows than
    * this sub-splits into md5-prefix ranges. 2^20 rows sort comfortably
    * inside one task; the adversarial case this guards is a corpus where
    * millions of documents share one exact score.
    */
  private[graft] val DefaultSubCap: Long = 1L << 20

  /** Strategy dial for the salted order statistics (q86/q91): `true`
    * derives sub-offsets from an md5-prefix-level pre-aggregation (the
    * corpus is scored twice; the extra exchange carries ≤ 256 rows per
    * value bucket — BOUNDED by |distinct values| × 256 whatever the
    * corpus size, which is what wins once scoring dominates at 100 TB),
    * `false` re-aggregates the raw scored rows for the sub-offsets (three
    * scoring passes, no hx-level exchange). MEASURED head-to-head by the
    * ScaleProbe harness (BENCH_SCALE.json, round 10, local[32],
    * min-of-2, same session): at sf0.1 (5 k docs) the strategies are
    * within noise — q86 1.23 vs 1.15 s, q91 2.93 vs 2.80 s
    * (preagg/rawrow) — and at 10× (50 k docs) the pre-agg WINS q86
    * outright (7.4 vs 10.2 s) and ties q91 (36.9 vs 38.0 s). The
    * round-8→9 bench delta that looked like a 2.2× regression of this
    * rework does not reproduce in a controlled A/B at the same scale; it
    * was the documented host-epoch bimodality, not the algorithm. The
    * pre-agg's edge grows with value-bucket population (its exchange is
    * bounded by |distinct values| × 256 rows whatever the corpus), so
    * the scan-optimal variant is the default. Both variants are
    * bit-identical for every cap (SaltedOrderStatsSpec).
    */
  private[graft] val OrderStatsPreAgg: Boolean = true

  /** q86's implementation, exposed with the sub-split cap as a parameter
    * so the spec can force every bucket through the salted path and prove
    * the output is bit-identical to the unsalted form. The within-value
    * order is (md5(id), id); because the sub-bucket id is a prefix-range
    * of that same md5 head (pow2Subs), the split is order-invisible, and
    * because every row of a value bucket shares `n_tokens`, the emitted
    * quantile values don't depend on within-value order at all.
    * `preAgg` picks the sub-offset strategy — see [[OrderStatsPreAgg]].
    */
  private[graft] def tokenQuantiles(s: SparkSession, dir: String, subCap: Long,
                                    preAgg: Boolean = OrderStatsPreAgg): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("text")
    val hk = md5(col("doc_id").cast("string").cast("binary"))
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(t).as("n_tokens"), hk.as("hk"))
      .withColumn("__hx", conv(substring(col("hk"), 1, 2), 16, 10).cast("int"))
    // preAgg: ONE md5-prefix-level aggregation (≤256 rows per value
    // bucket) feeds bucket offsets, fan-outs, AND sub-offsets — the
    // scored corpus is scanned twice in total. Otherwise the offsets
    // aggregate the raw rows directly and the sub-offset pass re-scores.
    val hxAgg = docs.groupBy(col("source"), col("n_tokens"), col("__hx"))
      .agg(count(lit(1)).as("__hc"))
    val bkts =
      if (preAgg) bucketOffsets(hxAgg, Seq("source"), "n_tokens", sum(col("__hc")))
      else bucketOffsets(docs, Seq("source"), "n_tokens", count(lit(1)))
    val counts = bkts.groupBy(col("source")).agg(sum(col("__bm")).as("n"))
    val offsets = bkts.select(col("source"), col("n_tokens"), col("__off").as("off"))
    val ns = bkts.select(col("source"), col("n_tokens"),
      pow2Subs(col("__bm"), subCap).as("__ns"))
    val sub = docs.join(broadcast(ns), Seq("source", "n_tokens"))
      .withColumn("__sub", expr("__hx div (256 div __ns)"))
    val subOff = (if (preAgg) {
      val hxSub = hxAgg.join(broadcast(ns), Seq("source", "n_tokens"))
        .withColumn("__sub", expr("__hx div (256 div __ns)"))
      bucketOffsets(hxSub, Seq("source", "n_tokens"), "__sub", sum(col("__hc")))
    } else bucketOffsets(sub, Seq("source", "n_tokens"), "__sub", count(lit(1))))
      .select(col("source"), col("n_tokens"), col("__sub"), col("__off").as("soff"))
    val wLocal = Window.partitionBy(col("source"), col("n_tokens"), col("__sub"))
      .orderBy(col("hk"), col("doc_id"))
    sub.withColumn("lr", row_number().over(wLocal))
      .join(broadcast(subOff), Seq("source", "n_tokens", "__sub"))
      .join(broadcast(offsets), Seq("source", "n_tokens"))
      .join(broadcast(counts), "source")
      .withColumn("rn", col("off") + col("soff") + col("lr"))
      .filter(col("rn") === expr("(n + 9) div 10") ||
        col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(9 * n + 9) div 10"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        max(when(col("rn") === expr("(n + 9) div 10"), col("n_tokens"))).as("p10_tokens"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_tokens"))).as("p50_tokens"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("n_tokens"))).as("p90_tokens"))
  }

  /** q91's implementation with the sub-split cap as a parameter. Unlike
    * q86, the emitted `tokens_before` DOES depend on within-value order,
    * so the tie-break is pinned to (md5(id), id) — the q90
    * content-independent order the oracle restates verbatim — and the
    * prefix-range sub-split (order-invisible by construction) keeps the
    * output identical for EVERY cap value, which is exactly what
    * SaltedOrderStatsSpec asserts. `preAgg` picks the sub-offset strategy
    * ([[OrderStatsPreAgg]]): with it, one md5-prefix-level aggregation
    * feeds offsets, fan-outs, and sub-offsets, so the scored corpus is
    * scanned exactly twice (agg + window stream); without it, the
    * sub-offset pass re-aggregates the scored rows. The row stream always
    * shuffles once, to the (q_mu, __sub) window.
    */
  private[graft] def tokenBudgetCut(s: SparkSession, dir: String, subCap: Long,
                                    preAgg: Boolean = OrderStatsPreAgg): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("text")
    val ws = col("ws")
    val hk = md5(col("doc_id").cast("string").cast("binary"))
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), t, Dedup.words(t).as("ws"))
      .select(col("doc_id"),
        TextAnalysis.qualityMicro(t, ws).as("q_mu"),
        TextAnalysis.tokenCount(t).cast("long").as("n_tokens"))
      .withColumn("hk", hk)
      .withColumn("__hx", conv(substring(col("hk"), 1, 2), 16, 10).cast("int"))
    val hxAgg = docs.groupBy(col("q_mu"), col("__hx"))
      .agg(sum(col("n_tokens")).as("__hm"), count(lit(1)).as("__hc"))
    val bkts =
      if (preAgg) bucketOffsets(hxAgg, Nil, "q_mu", sum(col("__hm")), desc = true,
        extra = Seq(sum(col("__hc")).as("__bc")))
      else bucketOffsets(docs, Nil, "q_mu", sum(col("n_tokens")), desc = true,
        extra = Seq(count(lit(1)).as("__bc")))
    // the corpus total re-sums the bucket measures — same aggregation
    // exchange as the offsets, NOT a second scoring pass over the corpus
    val tot = bkts.agg(sum(col("__bm")).as("__tot"))
    val offsets = bkts.select(col("q_mu"), col("__off").as("off"))
    // fan-out keys off ROW count (__bc): rows are what the window sorts
    val ns = bkts.select(col("q_mu"), pow2Subs(col("__bc"), subCap).as("__ns"))
    val sub = docs.join(broadcast(ns), "q_mu")
      .withColumn("__sub", expr("__hx div (256 div __ns)"))
    val subOff = (if (preAgg) {
      val hxSub = hxAgg.join(broadcast(ns), "q_mu")
        .withColumn("__sub", expr("__hx div (256 div __ns)"))
      bucketOffsets(hxSub, Seq("q_mu"), "__sub", sum(col("__hm")))
    } else bucketOffsets(sub, Seq("q_mu"), "__sub", sum(col("n_tokens"))))
      .select(col("q_mu"), col("__sub"), col("__off").as("soff"))
    val wLocal = Window.partitionBy(col("q_mu"), col("__sub"))
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sub.withColumn("lt", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
      .join(broadcast(subOff), Seq("q_mu", "__sub"))
      .join(broadcast(offsets), "q_mu")
      .crossJoin(broadcast(tot))
      .withColumn("tokens_before", col("off") + col("soff") + col("lt"))
      .filter(col("tokens_before") < expr("(__tot * 2) div 5"))
      .select(col("doc_id"), col("q_mu"), col("n_tokens"), col("tokens_before"))
  }

  /** The shared curation front-end of q44/q44a/q44b: score every document
    * map-side (exact integer micro-unit quality, language-ID, token
    * count — one projection, zero shuffles), keep high-quality English,
    * collapse exact duplicates with ONE min_by shuffle on the content
    * key. Every emitted column is a string or exact integer.
    */
  private def curationSurvivors(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val ws = col("ws")
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), t, Dedup.words(t).as("ws"))
      .select(col("doc_id"), col("lang"), t, ws,
        TextAnalysis.qualityMicro(t, ws).as("q_mu"),
        TextAnalysis.langIdW(ws).as("lang_guess"),
        TextAnalysis.tokenCount(t).as("n_tokens"))
      .filter(col("q_mu") >= 750000L && col("lang_guess") === "en")
      .drop("ws")
    Dedup.exactDedup(scored, Dedup.contentKey(t), col("doc_id"))
  }

  private val wsSplit = """string_split_regex(trim(lower(text)), '\s+')"""

  /** TextAnalysis.qualityMicro restated for DuckDB: integer micro-units
    * end-to-end, round-half-up via `(2a + b) // (2b)` — no double ever
    * feeds the score, so both engines agree bit-for-bit. Expects columns
    * `text` and `ws` in scope.
    */
  private[queries] val qMuSql: String =
    """((least(5000 * CAST(length(text) AS BIGINT), 1000000)
      |   + (1000000 - least(
      |       (10000000 * CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS BIGINT)
      |        + length(text)) // (CAST(length(text) AS BIGINT) * 2), 1000000))
      |   + (2000000 * CAST(list_unique(ws) AS BIGINT) + len(ws)) // (CAST(len(ws) AS BIGINT) * 2)
      |  ) * 2 + 3) // 6""".stripMargin

  // Shared restatement of the q44 curation front-end (score → filter →
  // exact-dedup): `k WHERE rn = 1` is the survivor set. Used verbatim by
  // q44 (per-lang accounting), q44a (raw sums), q44b (survivor rows) —
  // the decomposition that localizes any divergence to one stage.
  private val curationCtes: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, text, $wsSplit AS ws,
       |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens,
       |    len(list_filter($wsSplit,
       |      x -> x IN ('the','a','and','of','to','in','is','it','for','on'))) AS en_hits,
       |    len(list_filter($wsSplit,
       |      x -> x IN ('der','die','das','und','in','den','von','zu','mit','ist'))) AS de_hits,
       |    len(list_filter($wsSplit,
       |      x -> x IN ('el','la','de','que','y','en','un','es','por','con'))) AS es_hits
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang, ws, n_tokens,
       |    $qMuSql AS q_mu,
       |    CASE WHEN greatest(de_hits, en_hits, es_hits) = 0 THEN 'und'
       |         WHEN en_hits > de_hits THEN (CASE WHEN es_hits > en_hits THEN 'es' ELSE 'en' END)
       |         ELSE (CASE WHEN es_hits > de_hits THEN 'es' ELSE 'de' END) END AS lang_guess
       |  FROM d),
       |f AS (SELECT * FROM scored WHERE q_mu >= 750000 AND lang_guess = 'en'),
       |k AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY md5(array_to_string(ws, ' '))
       |                       ORDER BY doc_id) AS rn,
       |    count(*) OVER (PARTITION BY md5(array_to_string(ws, ' '))) AS gs
       |  FROM f)""".stripMargin

  // Pairs by brute-force shingle Jaccard (the q16 restatement), closed
  // into components with a recursive CTE — min label reachable from each
  // node IS its component's min id, since reachability is symmetric.
  // Shared verbatim by q58 (min-label propagation), q66 (large-star/
  // small-star), and q70 (keep-one survivorship): same closure, one
  // independent restatement checks all three.
  /** The clone perturbation: coordinate (vecId % 64) scaled by 1.0625 in
    * double — shared by [[embCloneCorpus]] and the q98 stream so every
    * consumer builds bit-identical clones.
    */
  private[graft] def perturbedClone(emb: Column, vecId: Column): Column =
    transform(emb, (x, i) =>
      when(i === pmod(vecId, lit(64L)).cast("int"), x * lit(1.0625d)).otherwise(x))

  /** q95/q97/q98's corpus: embeddings ∪ planted near-dup clones. Every
    * vec_id % 7 == 0 vector is cloned at id + 1_000_000 with coordinate
    * (vec_id % 64) scaled by 1.0625 — all in DOUBLE, restated verbatim
    * in the oracles (1-based index there), so both engines build the
    * bit-identical corpus.
    */
  private[graft] def embCloneCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("emb"))
    val clones = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        perturbedClone(col("emb"), col("vec_id")).as("emb"))
    emb.unionAll(clones)
  }

  // Shared oracle CTEs for the planted-clone corpus (q95/q97/q98): the
  // originals cast to double and the clones perturbed exactly as
  // embCloneCorpus does (1-based index here).
  private[queries] val embCloneCtes: String =
    """e0 AS (
      |  SELECT vec_id, [CAST(embedding[i] AS DOUBLE) for i in range(1, 65)] AS emb
      |  FROM embeddings),
      |c AS (
      |  SELECT ovid + 1000000 AS vec_id,
      |    [CASE WHEN i = ovid % 64 + 1 THEN emb[i] * 1.0625 ELSE emb[i] END
      |     for i in range(1, 65)] AS emb
      |  FROM (SELECT vec_id AS ovid, emb FROM e0 WHERE vec_id % 7 = 0))""".stripMargin

  private val dupClustersCtes: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, $wsSplit AS w FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 3
       |         THEN list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
       |         ELSE [array_to_string(w, ' ')] END AS sh
       |  FROM d),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |    AND least(len(a.sh), len(b.sh)) >= 0.9 * greatest(len(a.sh), len(b.sh))
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9),
       |e AS (SELECT id_a AS src, id_b AS dst FROM p
       |      UNION SELECT id_b, id_a FROM p),
       |walk(node, lbl) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.node),
       |lab AS (SELECT node, min(lbl) AS lbl FROM walk GROUP BY node)""".stripMargin

  // Exact-quota stratified sample: top ceil(0.2·n) per source by the md5
  // rank key — shared by q59 (single window) and q83 (range-bucketed
  // order statistics), which must agree row-for-row.
  private val stratifiedSampleOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
      |r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM d)
      |SELECT doc_id, source, CAST(rn AS INT) AS sample_rank
      |FROM r WHERE rn <= (n + 4) // 5""".stripMargin

  // Incremental-dedup survivors = odd-id (batch) docs in no cross-parity
  // brute-force near-dup pair with the even-id (corpus) half. Shared by
  // q75/q81 and the streaming ingestion form (q88 in StreamQueries).
  private[queries] val incrementalDedupOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, $wsSplit AS w FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 3
       |         THEN list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
       |         ELSE [array_to_string(w, ' ')] END AS sh
       |  FROM d),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |    AND least(len(a.sh), len(b.sh)) >= 0.9 * greatest(len(a.sh), len(b.sh))
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9),
       |drop_ids AS (
       |  SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS doc_id
       |  FROM p WHERE id_a % 2 <> id_b % 2)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM drop_ids)""".stripMargin

  // Exact nearest neighbor per vector, brute-forced with index-order dot
  // products (matches DotProduct's summation) — checks q29 directly and
  // q74 (the IVF machinery forced to exactness).
  private val nnOracle: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    (SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))
      |     FROM range(1, 65) t(i))
      |    / (sqrt((SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
      |       * sqrt((SELECT sum(CAST(b.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))) AS c
      |  FROM e a JOIN e b ON a.vec_id <> b.vec_id)
      |SELECT id_a AS vec_id, id_b AS nn_id, round(c, 6) AS cos FROM (
      |  SELECT id_a, id_b, c,
      |    row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS rn
      |  FROM p) WHERE rn = 1""".stripMargin

  /** Full restatement of the seed-centroid IVF recall pipeline (q82/q89):
    * seeds = corpus vectors at id % ⌈√n⌉ = 0 in id order (srank = the
    * engine's centroid index), cell assignment = argmax cosine over seeds
    * (ties → lower index, NearestCells' scan order), probes = top-nprobe
    * cells with nprobe = min(K, max(4, K/4)) (seedCentroids' dial),
    * candidates = probe-cell members minus self, IVF nn = argmax cosine
    * (ties → smaller id, the max_by (cos,−id) key), exact nn = brute
    * force, recall = round-half-up integer permille. `sampleCond` filters
    * the QUERY side on both legs (q89's md5 10% sample; TRUE for q82) —
    * the corpus side is never sampled. Cosines use the q29/q101
    * dot/(norm·norm) form; the ~1e-16 float path difference vs the
    * engine's unit-vector dots is far below any argmax gap on this data.
    */
  /** Shared CTE chain restating [[graft.scale.Similarity.seedCentroids]]
    * selection + cell assignment — used VERBATIM by both the recall
    * oracles (q82/q89) and the maintenance oracle (q105), so a change to
    * the seeding rule or tie order desyncs in one place, not silently in
    * two. `e` = corpus, `s` = seeds with `srank` (the engine's centroid
    * index), `rk` = per-vector seed ranking, `home` = home cell.
    */
  private val seedAssignCtes: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |md AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS m FROM e),
      |s AS (SELECT vec_id AS sid, embedding AS se,
      |        row_number() OVER (ORDER BY vec_id) AS srank
      |      FROM e, md WHERE vec_id % md.m = 0),
      |vs AS (
      |  SELECT e.vec_id, s.sid, s.srank,
      |    (SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(s.se[t.i] AS DOUBLE))
      |     FROM range(1, 65) t(i))
      |    / (sqrt((SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
      |       * sqrt((SELECT sum(CAST(s.se[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))) AS c
      |  FROM e, s),
      |rk AS (SELECT vec_id, sid,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, srank) AS rn
      |       FROM vs),
      |home AS (SELECT vec_id, sid AS cell FROM rk WHERE rn = 1)""".stripMargin

  /** The correlated-subquery cosine the embedding oracles share: 64-dim
    * dot over `range(1,65)` divided by both norms — DuckDB's sum order
    * matches the engine's ascending-index DotProduct, and the argmax
    * margins are canary-pinned in SimilaritySpec.
    */
  private def cosSql(a: String, b: String): String =
    s"""(SELECT sum(CAST($a[t.i] AS DOUBLE) * CAST($b[t.i] AS DOUBLE))
       |     FROM range(1, 65) t(i))
       |    / (sqrt((SELECT sum(CAST($a[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
       |       * sqrt((SELECT sum(CAST($b[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i))))""".stripMargin

  /** q33's full restatement: seed centroids, seed SUPER-cells, kid
    * assignment, top-superProbe routing, children-only top-nprobe cells,
    * home-cell membership, candidate argmax — the two-level
    * [[graft.scale.Similarity.seedSuperCells]]/RoutedNearestCells
    * pipeline verbatim. srank/sprank are 1-based row_numbers over the
    * id-ordered seed lists, so `(srank - 1) % m` is the engine's 0-based
    * `idx % smod` super selection, and every `ORDER BY c DESC, <rank>`
    * is the expressions' descending-dot/smaller-index tie rule.
    */
  private val routedSeedNnOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |md AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS m FROM e),
       |s AS (SELECT vec_id AS sid, embedding AS se,
       |        row_number() OVER (ORDER BY vec_id) AS srank
       |      FROM e, md WHERE vec_id % md.m = 0),
       |np AS (SELECT least(count(*), greatest(4, count(*) // 4)) AS p FROM s),
       |sm AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS m FROM s),
       |sup AS (SELECT sid, se AS ue, srank,
       |          row_number() OVER (ORDER BY srank) AS sprank
       |        FROM s, sm WHERE (srank - 1) % sm.m = 0),
       |sp AS (SELECT least(count(*), greatest(2, (count(*) + 1) // 2)) AS p FROM sup),
       |cs AS (
       |  SELECT s.srank AS crank, sup.sprank,
       |    ${cosSql("s.se", "sup.ue")} AS c
       |  FROM s, sup),
       |kid AS (SELECT crank, sprank FROM (
       |  SELECT crank, sprank,
       |    row_number() OVER (PARTITION BY crank ORDER BY c DESC, sprank) AS rn
       |  FROM cs) WHERE rn = 1),
       |vsup AS (
       |  SELECT e.vec_id, sup.sprank,
       |    ${cosSql("e.embedding", "sup.ue")} AS c
       |  FROM e, sup),
       |tsup AS (SELECT vec_id, sprank FROM (
       |  SELECT vec_id, sprank,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, sprank) AS rn
       |  FROM vsup), sp WHERE rn <= sp.p),
       |vcell AS (
       |  SELECT e.vec_id, s.srank,
       |    ${cosSql("e.embedding", "s.se")} AS c
       |  FROM e
       |  JOIN tsup ON tsup.vec_id = e.vec_id
       |  JOIN kid ON kid.sprank = tsup.sprank
       |  JOIN s ON s.srank = kid.crank),
       |rk AS (SELECT vec_id, srank,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, srank) AS rn
       |       FROM vcell),
       |home AS (SELECT vec_id, srank AS cell FROM rk WHERE rn = 1),
       |probes AS (SELECT rk.vec_id, rk.srank AS cell FROM rk, np WHERE rk.rn <= np.p),
       |cand AS (
       |  SELECT p.vec_id AS qid, h.vec_id AS mid
       |  FROM probes p JOIN home h ON p.cell = h.cell AND h.vec_id <> p.vec_id),
       |nnc AS (
       |  SELECT c.qid, c.mid,
       |    ${cosSql("a.embedding", "b.embedding")} AS c2
       |  FROM cand c JOIN e a ON a.vec_id = c.qid JOIN e b ON b.vec_id = c.mid)
       |SELECT qid AS vec_id, mid AS nn_id, round(c2, 6) AS cos FROM (
       |  SELECT qid, mid, c2,
       |    row_number() OVER (PARTITION BY qid ORDER BY c2 DESC, mid) AS rn
       |  FROM nnc) WHERE rn = 1""".stripMargin

  private def ivfRecallOracle(sampleCond: String => String, nAlias: String): String =
    s"""$seedAssignCtes,
       |np AS (SELECT least(count(*), greatest(4, count(*) // 4)) AS p FROM s),
       |probes AS (SELECT rk.vec_id, rk.sid AS cell FROM rk, np WHERE rk.rn <= np.p),
       |cand AS (
       |  SELECT p.vec_id AS qid, h.vec_id AS mid
       |  FROM probes p JOIN home h ON p.cell = h.cell AND h.vec_id <> p.vec_id
       |  WHERE ${sampleCond("p.vec_id")}),
       |ivfc AS (
       |  SELECT c.qid, c.mid,
       |    (SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))
       |     FROM range(1, 65) t(i))
       |    / (sqrt((SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
       |       * sqrt((SELECT sum(CAST(b.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))) AS c2
       |  FROM cand c JOIN e a ON a.vec_id = c.qid JOIN e b ON b.vec_id = c.mid),
       |ivf AS (SELECT qid AS vec_id, mid AS ivf_nn FROM (
       |  SELECT qid, mid,
       |    row_number() OVER (PARTITION BY qid ORDER BY c2 DESC, mid) AS rn
       |  FROM ivfc) WHERE rn = 1),
       |exc AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS mid,
       |    (SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))
       |     FROM range(1, 65) t(i))
       |    / (sqrt((SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
       |       * sqrt((SELECT sum(CAST(b.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))) AS c2
       |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
       |  WHERE ${sampleCond("a.vec_id")}),
       |ex AS (SELECT qid AS vec_id, mid AS exact_nn FROM (
       |  SELECT qid, mid,
       |    row_number() OVER (PARTITION BY qid ORDER BY c2 DESC, mid) AS rn
       |  FROM exc) WHERE rn = 1)
       |SELECT CAST(count(*) AS BIGINT) AS $nAlias,
       |  CAST(coalesce(sum(CASE WHEN ivf.ivf_nn = ex.exact_nn THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_match,
       |  CAST((coalesce(sum(CASE WHEN ivf.ivf_nn = ex.exact_nn THEN 1 ELSE 0 END), 0) * 2000
       |        + count(*)) // (count(*) * 2) AS BIGINT) AS recall_permille
       |FROM ex LEFT JOIN ivf USING (vec_id)""".stripMargin

  private val dupClustersOracle: String =
    s"""$dupClustersCtes,
       |sz AS (SELECT lbl, count(*) AS cluster_size FROM lab GROUP BY lbl)
       |SELECT lab.node AS doc_id, lab.lbl AS cluster_id, sz.cluster_size
       |FROM lab JOIN sz USING (lbl)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q15_exact_dedup" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_slice($wsSplit, 1, 8), ' ')) AS key
         |  FROM documents),
         |g AS (SELECT key, min(doc_id) AS keep, count(*) AS group_size
         |      FROM k GROUP BY key)
         |SELECT k.doc_id, k.key AS content_key, g.group_size
         |FROM k JOIN g ON k.key = g.key AND k.doc_id = g.keep""".stripMargin,

    // Brute-force 3-word-shingle Jaccard — the size-ratio ON-clause is a
    // sound prune (J <= min|sh|/max|sh|); the division is an exact integer
    // ratio in both engines, so the doubles compare bit-identically.
    "q16_minhash_neardup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $wsSplit AS w FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3
         |         THEN list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
         |         ELSE [array_to_string(w, ' ')] END AS sh
         |  FROM d)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS sim
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  AND least(len(a.sh), len(b.sh)) >= 0.9 * greatest(len(a.sh), len(b.sh))
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.9""".stripMargin,

    "q17_jaccard_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, list_distinct($wsSplit) AS ws FROM documents)
         |SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         |        / list_unique(a.ws || b.ws), 6) AS sim
         |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
         |      / list_unique(a.ws || b.ws) >= 0.9""".stripMargin,

    "q18_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, score FROM (
        |  SELECT e.vec_id,
        |    round(
        |      (SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qe[t.i] AS DOUBLE))
        |       FROM range(1, 65) t(i))
        |      / (sqrt((SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE))
        |               FROM range(1, 65) t(i)))
        |         * sqrt((SELECT sum(CAST(q.qe[t.i] AS DOUBLE) * CAST(q.qe[t.i] AS DOUBLE))
        |                 FROM range(1, 65) t(i)))), 6) AS score
        |  FROM embeddings e, q)
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,

    // Both stages of the quantized pipeline restated: per-vector int8
    // quantization (abs-max scale, round-half-away is identical in both
    // engines), quantized-cosine shortlist of 80, float-cosine rerank.
    // Quantized dots are exact small integers, so stage-1 ranking is
    // engine-independent; ORDER BY the unrounded rerank score.
    "q84_quantized_topk" ->
      """WITH d AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |s AS (
        |  SELECT vec_id, e, list_max([abs(x) for x in e]) AS sc FROM d),
        |z AS (
        |  SELECT vec_id, e, [CAST(round(x * 127 / sc) AS INT) for x in e] AS qv FROM s),
        |q AS (SELECT qv AS qqv, e AS qe FROM z WHERE vec_id = 0),
        |c AS (
        |  SELECT z.vec_id, z.e,
        |    (SELECT sum(CAST(z.qv[t.i] AS DOUBLE) * CAST(q.qqv[t.i] AS DOUBLE))
        |     FROM range(1, 65) t(i))
        |    / (sqrt((SELECT sum(CAST(z.qv[t.i] AS DOUBLE) * CAST(z.qv[t.i] AS DOUBLE))
        |             FROM range(1, 65) t(i)))
        |       * sqrt((SELECT sum(CAST(q.qqv[t.i] AS DOUBLE) * CAST(q.qqv[t.i] AS DOUBLE))
        |               FROM range(1, 65) t(i)))) AS qcos
        |  FROM z, q
        |  ORDER BY qcos DESC, z.vec_id LIMIT 80)
        |SELECT vec_id, round(cos, 6) AS score FROM (
        |  SELECT c.vec_id,
        |    (SELECT sum(c.e[t.i] * q.qe[t.i]) FROM range(1, 65) t(i))
        |    / (sqrt((SELECT sum(c.e[t.i] * c.e[t.i]) FROM range(1, 65) t(i)))
        |       * sqrt((SELECT sum(q.qe[t.i] * q.qe[t.i]) FROM range(1, 65) t(i)))) AS cos
        |  FROM c, q)
        |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,

    // Full ANN restatement: md5-derived plane coefficients → sign-bit
    // signatures → hamming-≤6 probe against vec_id 0's signature → exact
    // cosine rerank of the probed set. Order by the UNROUNDED score (the
    // engine ranks before rounding), round in the outer select.
    "q19_ann_lsh" ->
      """WITH sg AS (
        |  SELECT e.vec_id, e.embedding,
        |    CAST((SELECT sum(CASE WHEN (
        |        SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) *
        |          ((CAST(('0x' || substring(md5('plane:' || p.j || ':' || (t.i - 1)), 1, 15)) AS BIGINT)
        |            / 1152921504606846976.0) * 2 - 1))
        |        FROM range(1, 65) t(i)) > 0
        |      THEN CAST(1 AS BIGINT) << p.j ELSE CAST(0 AS BIGINT) END)
        |      FROM range(0, 12) p(j)) AS BIGINT) AS sig
        |  FROM embeddings e),
        |q AS (SELECT sig AS qsig, embedding AS qe FROM sg WHERE vec_id = 0)
        |SELECT vec_id, round(score, 6) AS score FROM (
        |  SELECT c.vec_id,
        |    (SELECT sum(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.qe[t.i] AS DOUBLE))
        |     FROM range(1, 65) t(i))
        |    / (sqrt((SELECT sum(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
        |             FROM range(1, 65) t(i)))
        |       * sqrt((SELECT sum(CAST(c.qe[t.i] AS DOUBLE) * CAST(c.qe[t.i] AS DOUBLE))
        |               FROM range(1, 65) t(i)))) AS score
        |  FROM (SELECT sg.vec_id, sg.embedding, q.qe FROM sg, q
        |        WHERE bit_count(xor(sg.sig, q.qsig)) <= 6) c
        |  ORDER BY score DESC, vec_id LIMIT 10)""".stripMargin,

    // Signature recomputed per document from scratch: per distinct word a
    // 60-bit md5-derived hash, per bit position the ±1 vote sum, bit set
    // when the sum is positive — the SimHash definition, independently
    // restated (nested list comprehensions, no shared code with the
    // engine).
    "q21_simhash" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_distinct($wsSplit) AS ws FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    [CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) for x in ws] AS hs
         |  FROM w)
         |SELECT doc_id,
         |  CAST(list_sum([
         |    CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
         |    for b in range(0, 60)]) AS BIGINT) AS sig
         |FROM h""".stripMargin,

    // Brute-force hamming join over the independently recomputed
    // signatures: the banded pipeline must emit exactly this set.
    "q36_simhash_pairs" ->
      s"""WITH w AS (
         |  SELECT doc_id, list_distinct($wsSplit) AS ws FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    [CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) for x in ws] AS hs
         |  FROM w),
         |s AS (
         |  SELECT doc_id,
         |    CAST(list_sum([
         |      CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0
         |           THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
         |      for b in range(0, 60)]) AS BIGINT) AS sig
         |  FROM h)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    "q20_text_stats" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, $wsSplit AS ws,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('the','a','and','of','to','in','is','it','for','on'))) AS en_hits,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('der','die','das','und','in','den','von','zu','mit','ist'))) AS de_hits,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('el','la','de','que','y','en','un','es','por','con'))) AS es_hits
         |  FROM documents)
         |SELECT doc_id,
         |  len(string_split_regex(trim(text), '\\s+')) AS n_words,
         |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens,
         |  round(CAST(list_unique(ws) AS DOUBLE) / len(ws), 6) AS distinct_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |        / length(text), 6) AS punct_ratio,
         |  round(CAST(en_hits AS DOUBLE) / len(ws), 6) AS stopword_ratio,
         |  CASE WHEN greatest(de_hits, en_hits, es_hits) = 0 THEN 'und'
         |       WHEN en_hits > de_hits THEN (CASE WHEN es_hits > en_hits THEN 'es' ELSE 'en' END)
         |       ELSE (CASE WHEN es_hits > de_hits THEN 'es' ELSE 'de' END) END AS lang_guess,
         |  CAST($qMuSql AS DOUBLE) / 1000000.0 AS quality,
         |  md5(array_to_string(ws, ' ')) AS fp_md5
         |FROM d""".stripMargin,

    // Independent restatement of the whole pipeline: survivor per content
    // key = min doc_id (exactDedup's min_by ordering leads with the
    // unique tie-break), group sizes counted within the filtered set.
    // All-integer output (avg stays in micro-units).
    "q44_curation" ->
      s"""$curationCtes
         |SELECT lang, count(*) AS n_unique, CAST(sum(gs) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST((sum(q_mu) * 2 + count(*)) // (count(*) * 2) AS BIGINT) AS avg_quality_micro
         |FROM k WHERE rn = 1 GROUP BY lang""".stripMargin,

    "q44a_curation_sums" ->
      s"""$curationCtes
         |SELECT lang, count(*) AS n_unique, CAST(sum(gs) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(q_mu) AS BIGINT) AS sum_q_mu
         |FROM k WHERE rn = 1 GROUP BY lang""".stripMargin,

    "q44b_curation_survivors" ->
      s"""$curationCtes
         |SELECT doc_id, lang, gs AS group_size, n_tokens, q_mu
         |FROM k WHERE rn = 1""".stripMargin,

    // Gram slices l[i:i+2] are 1-based INCLUSIVE in DuckDB; the 60-bit
    // gram hash is CAST('0x'||first-15-md5-hex-chars), matching Spark's
    // conv(substring(md5, 1, 15), 16, 10).
    "q46_winnow_fingerprints" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 3
         |       THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         |       ELSE [array_to_string(ws, ' ')] END AS grams FROM d),
         |h AS (SELECT doc_id,
         |  [CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) for g in grams] AS hs
         |  FROM g),
         |w AS (SELECT doc_id,
         |  CASE WHEN len(hs) >= 4
         |       THEN [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
         |       ELSE [list_min(hs)] END AS mins FROM h)
         |SELECT doc_id, len(list_distinct(mins)) AS n_fps,
         |  concat('[', array_to_string(list_sort(list_distinct(mins)), ','), ']') AS fps
         |FROM w""".stripMargin,

    "q47_overlap_pairs" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 3
         |       THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         |       ELSE [array_to_string(ws, ' ')] END AS grams FROM d),
         |h AS (SELECT doc_id,
         |  [CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) for g in grams] AS hs
         |  FROM g),
         |w AS (SELECT doc_id,
         |  CASE WHEN len(hs) >= 4
         |       THEN [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
         |       ELSE [list_min(hs)] END AS mins FROM h),
         |e0 AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM w),
         |keep AS (SELECT fp FROM e0 GROUP BY fp HAVING count(*) <= 256),
         |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN keep USING (fp))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "q50_decontamination" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(ws) >= 3
         |       THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         |       ELSE [array_to_string(ws, ' ')] END AS grams FROM d),
         |h AS (SELECT doc_id,
         |  [CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) for g in grams] AS hs
         |  FROM g),
         |w AS (SELECT doc_id,
         |  CASE WHEN len(hs) >= 4
         |       THEN [list_min(hs[i:i+3]) for i in range(1, len(hs) - 2)]
         |       ELSE [list_min(hs)] END AS mins FROM h),
         |e0 AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM w),
         |keep AS (SELECT fp FROM e0 GROUP BY fp HAVING count(*) <= 256),
         |e AS (SELECT e0.doc_id, e0.fp FROM e0 JOIN keep USING (fp))
         |SELECT doc_id, count(DISTINCT fp) AS n_contaminated
         |FROM e
         |WHERE doc_id % 2 = 0
         |  AND fp IN (SELECT fp FROM e WHERE doc_id % 2 = 1)
         |GROUP BY doc_id""".stripMargin,

    "q29_embedding_nn" -> nnOracle,

    // the routed two-level IVF pipeline restated end to end — seed
    // centroids + seed supers make every routing decision SQL-derivable
    "q33_embedding_nn_ivf" -> routedSeedNnOracle,
    // the IVF join at nprobe=K / all supers probed degenerates to the
    // exact NN join — one brute-force restatement checks both
    "q74_ivf_exact" -> nnOracle,

    // seed-centroid IVF recall artifacts — the WHOLE approximation
    // pipeline restated, so the recall number is under the hash gate
    "q82_ivf_recall" -> ivfRecallOracle(_ => "TRUE", "n_vectors"),
    "q89_ivf_recall_sampled" -> ivfRecallOracle(
      q => s"CAST(('0x' || substring(md5(CAST($q AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0",
      "n_sampled"),

    // q105: the maintenance lifecycle restated — every id's home cell is
    // the argmax cosine over the seed vectors (build and append use the
    // same stored matrix), compaction's distinct() drops exactly the
    // replayed id%3 slice, and the occupied-cell stats follow from the
    // assignment alone. files_reclaimed is the direction contract
    // (strictly fewer files after the one-file-per-bucket rewrite).
    "q105_index_maintenance_stats" ->
      s"""$seedAssignCtes,
        |cz AS (SELECT cell, count(*) AS n FROM home GROUP BY cell),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS buckets,
        |               CAST(max(n) AS BIGINT) AS max_bucket_rows,
        |               CAST(coalesce(sum(CASE WHEN n > 64 THEN 1 ELSE 0 END), 0) AS BIGINT) AS oversized_buckets
        |        FROM cz),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS total,
        |              CAST(count(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT) AS planted
        |       FROM e)
        |SELECT nn.total + nn.planted AS rows_before, nn.total AS rows_after,
        |  nn.planted AS rows_dropped, agg.buckets, agg.max_bucket_rows,
        |  agg.oversized_buckets, TRUE AS files_reclaimed
        |FROM nn, agg""".stripMargin,

    // the persisted-index probe at nprobe=K: best EVEN neighbor of each
    // ODD vector, brute-forced (index-order dots = DotProduct)
    "q101_ivf_index_probe" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    (SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))
        |     FROM range(1, 65) t(i))
        |    / (sqrt((SELECT sum(CAST(a.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))
        |       * sqrt((SELECT sum(CAST(b.embedding[t.i] AS DOUBLE) ^ 2) FROM range(1, 65) t(i)))) AS c
        |  FROM e a JOIN e b ON a.vec_id % 2 = 1 AND b.vec_id % 2 = 0)
        |SELECT id_a AS vec_id, id_b AS nn_id, round(c, 6) AS cos FROM (
        |  SELECT id_a, id_b, c,
        |    row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS rn
        |  FROM p) WHERE rn = 1""".stripMargin,

    "q37_top_ngrams" ->
      s"""WITH w AS (SELECT $wsSplit AS ws FROM documents),
         |b AS (
         |  SELECT unnest([array_to_string(ws[i:i+1], ' ')
         |                 for i in range(1, len(ws))]) AS bigram
         |  FROM w WHERE len(ws) >= 2)
         |SELECT bigram, count(*) AS cnt FROM b
         |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 100""".stripMargin,

    "q22_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(length(text) AS INT) AS size_bytes,
        |  hex(substr(text, 1, 8)) AS head_hex
        |FROM documents""".stripMargin,

    // the exported file's bytes are the text's UTF-8 encoding, so byte
    // length (strlen) and md5 restate directly from the source table
    "q106_binaryfile_ingest" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    // the tar framing is transparent to the contract: entry bytes are the
    // text's UTF-8 encoding, so the oracle is q106's on the q107 subset
    "q107_shard_ingest" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents WHERE doc_id % 10 = 5""".stripMargin,

    "q58_dup_clusters" -> dupClustersOracle,
    "q66_dup_clusters_bigstar" -> dupClustersOracle,

    // Survivors = odd-id docs in no cross-parity brute-force pair.
    // (Exact dups have identical shingle sets ⇒ Jaccard 1.0 ⇒ already in
    // the pair set, so the engine's exact-key pass drops a subset of the
    // same ids — the restatement needs only the pairs.) Shared verbatim
    // by q81: the persisted-index probe implements the SAME contract with
    // O(batch) work, so one restatement checks both the recompute-world
    // answer (q75) and the index-world answer (q81) against each other.
    "q75_incremental_dedup" -> incrementalDedupOracle,

    "q81_indexed_incremental_dedup" -> incrementalDedupOracle,

    // compaction must not change what the index IS — same restatement
    "q102_compacted_index_probe" -> incrementalDedupOracle,

    "q70_neardup_dedup" ->
      s"""$dupClustersCtes
         |SELECT doc.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN lab.node IS NULL OR lab.lbl = doc.doc_id
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(count(*) - sum(CASE WHEN lab.node IS NULL OR lab.lbl = doc.doc_id
         |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM documents doc LEFT JOIN lab ON doc.doc_id = lab.node
         |GROUP BY 1""".stripMargin,

    // Quality restated as in q44 — integer micro-units end-to-end, so
    // ranking, budget, and allocations match exactly.
    "q69_mixture" ->
      s"""WITH d AS (
         |  SELECT source, text, $wsSplit AS ws,
         |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens
         |  FROM documents),
         |q AS (
         |  SELECT source, n_tokens,
         |    $qMuSql AS q_mu
         |  FROM d),
         |a AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |    CAST(sum(q_mu) AS BIGINT) AS sq
         |  FROM q GROUP BY 1),
         |m AS (
         |  SELECT source, n_docs, sum_tokens,
         |    CAST((sq * 2 + n_docs) // (n_docs * 2) AS DOUBLE) / 1000000.0 AS q_mean
         |  FROM a),
         |t AS (SELECT CAST(sum(sum_tokens) AS BIGINT) AS tot FROM a),
         |c AS (
         |  SELECT m.*, (t.tot * 6) // 10 AS budget,
         |    CAST(coalesce(sum(sum_tokens) OVER (
         |      ORDER BY q_mean DESC, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         |  FROM m, t)
         |SELECT source, n_docs, sum_tokens, q_mean,
         |  CAST(greatest(0, least(sum_tokens, budget - cum)) AS BIGINT) AS alloc_tokens,
         |  greatest(0, least(sum_tokens, budget - cum)) > 0 AS included
         |FROM c""".stripMargin,

    "q73_sql_surface" ->
      s"""WITH w AS (
         |  SELECT doc_id, $wsSplit AS ws, list_distinct($wsSplit) AS dws
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    len(list_filter(ws,
         |      x -> x IN ('the','a','and','of','to','in','is','it','for','on'))) AS en_hits,
         |    [CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) for x in dws] AS hs
         |  FROM w)
         |SELECT doc_id, CAST(en_hits AS INT) AS en_hits,
         |  CAST(list_sum([
         |    CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
         |    for b in range(0, 60)]) AS BIGINT) AS sig
         |FROM h""".stripMargin,

    // Same micro-nat quantization before the per-doc sum: integer sums
    // are order-independent, and the per-word −ln is one IEEE expression
    // over identical exact ratios.
    "q67_surprisal" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsSplit) AS term FROM documents),
         |tf AS (SELECT term, count(*) AS ctf FROM w GROUP BY 1),
         |tot AS (SELECT sum(ctf) AS n_tot FROM tf),
         |x AS (
         |  SELECT w.doc_id,
         |    CAST(round(-ln(CAST(ctf AS DOUBLE) / CAST(n_tot AS DOUBLE)) * 1000000)
         |         AS BIGINT) AS s_mu
         |  FROM w JOIN tf USING (term), tot)
         |SELECT doc_id, count(*) AS n_words,
         |  round((CAST(sum(s_mu) AS DOUBLE) / count(*)) / 1000000.0, 6) AS avg_surprisal
         |FROM x GROUP BY doc_id""".stripMargin,

    // History word recovered from the bigram text itself (words contain
    // no spaces, so split_part(bg, ' ', 1) = w1) — an independent route
    // to the same conditional.
    "q94_bigram_surprisal" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |o AS (
         |  SELECT doc_id,
         |    unnest([array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))]) AS bg
         |  FROM d WHERE len(ws) >= 2),
         |ob AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM o),
         |cb AS (SELECT bg, count(*) AS cb FROM ob GROUP BY bg),
         |ch AS (SELECT w1, count(*) AS ch FROM ob GROUP BY w1),
         |x AS (
         |  SELECT ob.doc_id,
         |    CAST(round(-ln(CAST(cb.cb AS DOUBLE) / CAST(ch.ch AS DOUBLE)) * 1000000)
         |         AS BIGINT) AS s_mu
         |  FROM ob JOIN cb USING (bg) JOIN ch USING (w1))
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round((CAST(sum(s_mu) AS DOUBLE) / count(*)) / 1000000.0, 6)
         |    AS avg_bigram_surprisal
         |FROM x GROUP BY doc_id""".stripMargin,

    // Chunking, distinct-doc counts, and order-preserving reassembly all
    // restated; `list(... ORDER BY pos) FILTER` goes NULL (not empty)
    // when every chunk is boilerplate — coalesce matches Spark's empty
    // collect_list → md5('').
    "q96_chunk_dedup" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS w FROM documents),
         |ch AS (
         |  SELECT doc_id, u['pos'] AS pos, u['chunk'] AS chunk FROM (
         |    SELECT doc_id,
         |      unnest([{'pos': i, 'chunk': array_to_string(w[i*3+1:i*3+3], ' ')}
         |              for i in range(0, len(w)//3)]) AS u
         |    FROM d WHERE len(w) >= 3)),
         |bp AS (
         |  SELECT chunk FROM (
         |    SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk)
         |  WHERE nd >= 3),
         |fl AS (
         |  SELECT ch.doc_id, ch.pos, ch.chunk, bp.chunk IS NOT NULL AS is_bp
         |  FROM ch LEFT JOIN bp USING (chunk))
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  md5(coalesce(array_to_string(list(chunk ORDER BY pos) FILTER (NOT is_bp), ' '), ''))
         |    AS kept_fp
         |FROM fl GROUP BY doc_id""".stripMargin,

    // The funnel restated stage by stage: scoring + language CTEs with
    // `source` carried through, the survivor via the same pass-first
    // content-key window, FILTERed counts per stage.
    "q112_curation_funnel" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text, $wsSplit AS ws,
         |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('the','a','and','of','to','in','is','it','for','on'))) AS en_hits,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('der','die','das','und','in','den','von','zu','mit','ist'))) AS de_hits,
         |    len(list_filter($wsSplit,
         |      x -> x IN ('el','la','de','que','y','en','un','es','por','con'))) AS es_hits
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source, ws, n_tokens,
         |    $qMuSql AS q_mu,
         |    CASE WHEN greatest(de_hits, en_hits, es_hits) = 0 THEN 'und'
         |         WHEN en_hits > de_hits THEN (CASE WHEN es_hits > en_hits THEN 'es' ELSE 'en' END)
         |         ELSE (CASE WHEN es_hits > de_hits THEN 'es' ELSE 'de' END) END AS lang_guess
         |  FROM d),
         |fl AS (
         |  SELECT doc_id, source, ws, n_tokens,
         |    (q_mu >= 750000) AS pass_q,
         |    (q_mu >= 750000 AND lang_guess = 'en') AS pass_lang
         |  FROM scored),
         |k AS (
         |  SELECT *, row_number() OVER (
         |      PARTITION BY md5(array_to_string(ws, ' '))
         |      ORDER BY pass_lang DESC, doc_id) AS rn
         |  FROM fl)
         |SELECT source, count(*) AS n_docs,
         |  count(*) FILTER (WHERE pass_q) AS n_quality,
         |  count(*) FILTER (WHERE pass_lang) AS n_lang,
         |  count(*) FILTER (WHERE pass_lang AND rn = 1) AS n_unique,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_in,
         |  CAST(coalesce(sum(n_tokens) FILTER (WHERE pass_lang AND rn = 1), 0) AS BIGINT)
         |    AS tokens_kept
         |FROM k GROUP BY source""".stripMargin,

    // The same planted drift restated through DuckDB's utf8proc NFC —
    // byte-exact agreement with the JVM Normalizer is the contract.
    "q122_unicode_normalize" ->
      """WITH d AS (
        |  SELECT lang, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'Cafe' || chr(769)
        |         ELSE 'Caf' || chr(233) END AS suf
        |  FROM documents)
        |SELECT lang, count(*) AS n,
        |  count(CASE WHEN nfc_normalize(suf) <> suf THEN 1 END) AS n_denorm,
        |  count(DISTINCT md5(suf)) AS distinct_raw_keys,
        |  count(DISTINCT md5(nfc_normalize(suf))) AS distinct_norm_keys,
        |  count(DISTINCT md5(nfc_normalize(text || ' ' || suf))) AS distinct_docs
        |FROM d GROUP BY 1""".stripMargin,

    // The window restatement of the Aggregator's contract: row_number
    // over (q_mu DESC, doc_id ASC) per source, kept through rank 3.
    "q120_grouped_topk" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text, $wsSplit AS ws FROM documents),
         |s AS (
         |  SELECT doc_id, source, $qMuSql AS q_mu FROM d),
         |r AS (
         |  SELECT source, doc_id, q_mu,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY q_mu DESC, doc_id) AS rank
         |  FROM s)
         |SELECT source, rank, doc_id, CAST(q_mu AS BIGINT) AS q_mu
         |FROM r WHERE rank <= 3""".stripMargin,

    // Components from the brute-force pair ground truth + the shared
    // integer quality fragment + a per-cluster argmax window (DESC q_mu,
    // ties to the smaller id — the max_by key restated).
    "q99_cluster_best_rep" ->
      s"""$dupClustersCtes,
         |q AS (
         |  SELECT doc_id, $qMuSql AS q_mu
         |  FROM (SELECT doc_id, text, $wsSplit AS ws FROM documents)),
         |sz AS (SELECT lbl, count(*) AS cluster_size FROM lab GROUP BY lbl),
         |best AS (
         |  SELECT lab.lbl AS cluster_id, q.doc_id, q.q_mu,
         |    row_number() OVER (PARTITION BY lab.lbl
         |                       ORDER BY q.q_mu DESC, q.doc_id) AS rn
         |  FROM lab JOIN q ON lab.node = q.doc_id)
         |SELECT best.cluster_id, best.doc_id AS keep_id, best.q_mu AS keep_q_mu,
         |  sz.cluster_size
         |FROM best JOIN sz ON best.cluster_id = sz.lbl
         |WHERE rn = 1""".stripMargin,

    // Brute-force batch × corpus ground truth for the indexed probe:
    // every (clone, original) cross pair with true cosine >= 0.8 — the
    // same corpus/clone/unit construction as q95's oracle, cross-joined
    // instead of clustered.
    "q97_indexed_embedding_neardup" ->
      s"""WITH $embCloneCtes,
        |n0 AS (
        |  SELECT vec_id, emb,
        |    sqrt((SELECT sum(emb[t.i] * emb[t.i]) FROM range(1, 65) t(i))) AS nrm
        |  FROM e0),
        |nc AS (
        |  SELECT vec_id, emb,
        |    sqrt((SELECT sum(emb[t.i] * emb[t.i]) FROM range(1, 65) t(i))) AS nrm
        |  FROM c),
        |u0 AS (SELECT vec_id, [emb[i] / nrm for i in range(1, 65)] AS u FROM n0),
        |uc AS (SELECT vec_id, [emb[i] / nrm for i in range(1, 65)] AS u FROM nc),
        |p AS (
        |  SELECT b.vec_id AS vec_id, a.vec_id AS match_id,
        |    (SELECT sum(a.u[t.i] * b.u[t.i]) FROM range(1, 65) t(i)) AS cs
        |  FROM u0 a, uc b)
        |SELECT vec_id, match_id, round(cs, 6) AS cos FROM p WHERE cs >= 0.8""".stripMargin,

    // The recall artifact's expected value: the brute-force cross-pair
    // count (q97's construction), with n_found equal to it and recall
    // exactly 1000 permille — restatable BECAUSE the engine's banding
    // recall is deterministic-1.0 on this corpus (q95/q97's hash-checked
    // contract). A single missed pair diverges n_found and recall, so
    // the hash compare IS the recall regression gate. count(*) is
    // already BIGINT in DuckDB; the casts keep the type-class guard
    // (tools/selfcheck.py) trivially satisfied.
    "q103_cosine_recall" ->
      s"""WITH $embCloneCtes,
        |n0 AS (
        |  SELECT vec_id, emb,
        |    sqrt((SELECT sum(emb[t.i] * emb[t.i]) FROM range(1, 65) t(i))) AS nrm
        |  FROM e0),
        |nc AS (
        |  SELECT vec_id, emb,
        |    sqrt((SELECT sum(emb[t.i] * emb[t.i]) FROM range(1, 65) t(i))) AS nrm
        |  FROM c),
        |u0 AS (SELECT vec_id, [emb[i] / nrm for i in range(1, 65)] AS u FROM n0),
        |uc AS (SELECT vec_id, [emb[i] / nrm for i in range(1, 65)] AS u FROM nc),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM u0 a, uc b
        |  WHERE (SELECT sum(a.u[t.i] * b.u[t.i]) FROM range(1, 65) t(i)) >= 0.8)
        |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
        |  CAST(count(*) AS BIGINT) AS n_found,
        |  CAST(1000 AS BIGINT) AS recall_permille
        |FROM p""".stripMargin,

    // Brute-force ground truth for the LSH pipeline (the q16 contract):
    // ALL pair cosines over the clone-planted corpus, threshold 0.8,
    // recursive-CTE components, keep min id per cluster. Every float op
    // (cast, ×1.0625, /norm, index-order dot, sqrt) is the identical
    // IEEE sequence on both engines, and the planted-pair cosines
    // (≥ 0.9997) vs the max natural pair (≈ 0.6) leave no borderline
    // comparison at 0.8.
    "q95_embedding_neardup_dedup" ->
      s"""WITH RECURSIVE $embCloneCtes,
        |corpus AS (SELECT * FROM e0 UNION ALL SELECT * FROM c),
        |nn AS (
        |  SELECT vec_id, emb,
        |    sqrt((SELECT sum(emb[t.i] * emb[t.i]) FROM range(1, 65) t(i))) AS nrm
        |  FROM corpus),
        |u AS (SELECT vec_id, [emb[i] / nrm for i in range(1, 65)] AS u FROM nn),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM u a JOIN u b ON a.vec_id < b.vec_id
        |  WHERE (SELECT sum(a.u[t.i] * b.u[t.i]) FROM range(1, 65) t(i)) >= 0.8),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |walk(node, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.node),
        |lab AS (SELECT node, min(lbl) AS lbl FROM walk GROUP BY node)
        |SELECT corpus.vec_id % 10 AS shard, count(*) AS n_vecs,
        |  CAST(sum(CASE WHEN lab.node IS NULL OR lab.lbl = corpus.vec_id
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(count(*) - sum(CASE WHEN lab.node IS NULL OR lab.lbl = corpus.vec_id
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM corpus LEFT JOIN lab ON corpus.vec_id = lab.node
        |GROUP BY 1""".stripMargin,

    "q57_split_assign" ->
      """SELECT doc_id, source,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // Mode counts via an INDEPENDENT algorithm (per-distinct-element
    // filter counts vs the engine's sorted-run trick); max_run via
    // run-boundary indices.
    "q54_repetition" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |f AS (
         |  SELECT doc_id, ws, len(ws) AS n,
         |    CASE WHEN len(ws) >= 2
         |         THEN [array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))]
         |         ELSE CAST([] AS VARCHAR[]) END AS bg
         |  FROM d),
         |r AS (
         |  SELECT doc_id, n, len(bg) AS nb,
         |    [i for i in range(1, n + 1) if i = 1 OR ws[i] != ws[i-1]] AS rb,
         |    list_max([len(list_filter(ws, y -> y = x)) for x in list_distinct(ws)]) AS topw,
         |    CASE WHEN len(bg) = 0 THEN 0
         |         ELSE list_max([len(list_filter(bg, y -> y = x)) for x in list_distinct(bg)]) END AS topb
         |  FROM f),
         |m AS (
         |  SELECT doc_id, n, nb, topw, topb,
         |    list_max([(list_concat(rb, [n + 1]))[k + 1] - rb[k]
         |              for k in range(1, len(rb) + 1)]) AS max_run
         |  FROM r)
         |SELECT doc_id, CAST(n AS INT) AS n_words, CAST(max_run AS INT) AS max_run,
         |  round(CAST(topw AS DOUBLE) / n, 6) AS top_word_frac,
         |  CASE WHEN nb = 0 THEN 0.0
         |       ELSE round(CAST(topb AS DOUBLE) / nb, 6) END AS top_bigram_frac,
         |  (max_run >= 5 OR round(CAST(topw AS DOUBLE) / n, 6) > 0.2
         |   OR (CASE WHEN nb = 0 THEN 0.0
         |            ELSE round(CAST(topb AS DOUBLE) / nb, 6) END) > 0.18) AS repetitive
         |FROM m""".stripMargin,

    "q59_stratified_sample" -> stratifiedSampleOracle,

    // The bucketed two-pass ranking must reproduce the simple window's
    // answer EXACTLY — one restatement checks both implementations
    // against each other (same pattern as q58/q66 and q75/q81).
    "q83_stratified_sample_bucketed" -> stratifiedSampleOracle,

    // percentile_disc rank arithmetic restated: value at ceil(p·n) of the
    // (value, id)-sorted group. INT casts match Spark's size() width.
    "q86_token_quantiles" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT source, n_tokens,
         |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM d)
         |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         |  CAST(max(CASE WHEN rn = (n + 9) // 10 THEN n_tokens END) AS INT) AS p10_tokens,
         |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END) AS INT) AS p50_tokens,
         |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tokens END) AS INT) AS p90_tokens
         |FROM r
         |WHERE rn = (n + 9) // 10 OR rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10
         |GROUP BY source""".stripMargin,

    // The draw and the score both restated from scratch; the WHERE is
    // the same integer compare, so membership AND mechanism are checked.
    "q92_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, source, text, $wsSplit AS ws FROM documents),
         |s AS (
         |  SELECT doc_id, source, $qMuSql AS q_mu,
         |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % 1000000 AS draw
         |  FROM d)
         |SELECT doc_id, source, q_mu, draw FROM s WHERE draw < q_mu""".stripMargin,

    // sqrt is correctly-rounded IEEE in every engine, so the integer
    // thresholds floor(1e6*sqrt(share)) agree bit-for-bit.
    "q93_temperature_rebalance" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT source, sum(n_tokens) AS src_tokens FROM d GROUP BY source),
         |t AS (SELECT sum(src_tokens) AS tot FROM b),
         |th AS (
         |  SELECT source, src_tokens,
         |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
         |         * 1000000.0) AS BIGINT) AS keep_thr
         |  FROM b, t)
         |SELECT d.doc_id, d.source, d.n_tokens, th.keep_thr,
         |  CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |    % 1000000 AS draw
         |FROM d JOIN th USING (source)
         |WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % 1000000 < th.keep_thr""".stripMargin,

    // Global md5 total order restated as one window — the engine must
    // reproduce these exact positions from its bucketed two-pass ranking.
    "q90_corpus_shuffle" ->
      """SELECT doc_id, source,
        |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |    AS shuffle_rank
        |FROM documents""".stripMargin,

    // Greedy budget cut restated as one quality-ordered cumulative sum;
    // the budget boundary is integer arithmetic on exact token counts.
    // Within-value tie-break is the q90 md5 order — the same
    // content-independent order the engine's prefix-range sub-split
    // preserves at any fan-out.
    "q91_token_budget_cut" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, $wsSplit AS ws,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |s AS (SELECT doc_id, $qMuSql AS q_mu, n_tokens FROM d),
         |c AS (
         |  SELECT *,
         |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY q_mu DESC,
         |      md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
         |  FROM s),
         |t AS (SELECT sum(n_tokens) AS tot FROM s)
         |SELECT doc_id, q_mu, n_tokens, tokens_before
         |FROM c, t WHERE tokens_before < (tot * 2) // 5""".stripMargin,

    // The quality rank key is (exact integer micro-units, unique id), so
    // the kept set and ranks are engine-independent.
    "q87_source_cap" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, text, $wsSplit AS ws FROM documents),
         |s AS (
         |  SELECT doc_id, source, $qMuSql AS q_mu FROM d),
         |r AS (
         |  SELECT doc_id, source, q_mu,
         |    row_number() OVER (PARTITION BY source ORDER BY q_mu DESC, doc_id) AS rn
         |  FROM s)
         |SELECT doc_id, source, q_mu, CAST(rn AS INT) AS rank_in_source
         |FROM r WHERE rn <= 15""".stripMargin,

    // idf quantized to integer micro-nats before scoring (mirrors the
    // engine): ranking runs on an exact integer product.
    "q60_tfidf_terms" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsSplit) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    tf.tf * CAST(round(ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000)
         |                 AS BIGINT) AS tfidf_mu
         |  FROM tf JOIN df USING (term), n),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY tfidf_mu DESC, term) AS rk
         |  FROM sc)
         |SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, df,
         |  CAST(tfidf_mu AS DOUBLE) / 1000000.0 AS tfidf
         |FROM rk WHERE rk <= 3""".stripMargin,

    // Centroid components recomputed as the same exact integer sums; the
    // cosine's three dot products are correlated subqueries over an
    // ordered range — index-order summation, matching DotProduct.
    "q64_label_cohesion" ->
      """WITH x AS (
        |  SELECT label, t.i AS pos,
        |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i)),
        |c AS (
        |  SELECT label, pos, sum(v) AS sv FROM x GROUP BY 1, 2),
        |cl AS (
        |  SELECT label, list(CAST(sv AS DOUBLE) ORDER BY pos) AS c
        |  FROM c GROUP BY label)
        |SELECT e.vec_id, e.label,
        |  round(
        |    (SELECT sum(CAST(e.embedding[t.i] AS DOUBLE) * cl.c[t.i])
        |     FROM range(1, 65) t(i))
        |    / (sqrt((SELECT sum(CAST(e.embedding[t.i] AS DOUBLE)
        |                        * CAST(e.embedding[t.i] AS DOUBLE))
        |             FROM range(1, 65) t(i)))
        |       * sqrt((SELECT sum(cl.c[t.i] * cl.c[t.i])
        |               FROM range(1, 65) t(i)))), 6) AS cohesion
        |FROM embeddings e JOIN cl USING (label)""".stripMargin,

    "q63_pack" ->
      """WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY hk, doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS offset
        |FROM c""".stripMargin,

    // Slices are 1-based INCLUSIVE: chunk i covers words i·24+1 .. i·24+32.
    "q62_passages" ->
      s"""WITH d AS (SELECT doc_id, $wsSplit AS ws FROM documents),
         |c AS (SELECT doc_id, ws,
         |        CAST(1 + ceil(greatest(len(ws) - 32, 0) / 24.0) AS INT) AS nc
         |      FROM d),
         |e AS (SELECT doc_id, unnest(range(0, nc)) AS chunk_id, ws FROM c)
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |  CAST(len(string_split(
         |    array_to_string(ws[chunk_id*24+1:chunk_id*24+32], ' '), ' ')) AS INT) AS n_words,
         |  md5(array_to_string(ws[chunk_id*24+1:chunk_id*24+32], ' ')) AS chunk_fp
         |FROM e""".stripMargin,

    // Frames re-sliced from the same bytes. DuckDB has no BLOB substring,
    // so the slice runs on the VARCHAR — equivalent here because this
    // corpus is pure ASCII (octet_length = length for every row, which
    // the q22 head-hex check already pins); a multibyte corpus would need
    // the engine-side byte offsets restated differently.
    "q77_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text AS p, octet_length(encode(text)) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, p,
        |    CASE WHEN n = 0 THEN 0
        |         ELSE CAST(1 + least(ceil(greatest(n - 16, 0) / 48.0),
        |                             greatest(floor((n - 1) / 48.0), 0)) AS INT)
        |    END AS nf
        |  FROM b),
        |e AS (SELECT doc_id, unnest(range(0, nf)) AS i, p FROM c)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  hex(substring(p, CAST(i * 48 + 1 AS INT), 16)) AS frame_hex
        |FROM e""".stripMargin,

    // The stub formulas restated over the same bytes: payload is the
    // UTF-8 text, so md5(text)/strlen(text) see identical input.
    "q23_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(16 + CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % 16 AS INT) AS width,
        |  CAST(16 + strlen(text) % 16 AS INT) AS height,
        |  CAST(1 + strlen(text) // 64 AS INT) AS n_frames
        |FROM documents""".stripMargin)
}
