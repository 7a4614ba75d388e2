package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths, both UDF-free:
  *  - BRUTE-FORCE cosine top-k: one scan, per-row dot product via
  *    `zip_with`+`aggregate` (all in DoubleType for cross-engine
  *    reproducibility), `ORDER BY score LIMIT k` — Spark's TakeOrdered
  *    keeps only k rows per partition, so the "sort" is a per-partition
  *    heap + tiny driver merge, no full shuffle. This is the exact
  *    baseline and the right plan up to ~10⁹ vectors per query batch.
  *  - LSH (random hyperplanes): deterministic seeded pseudo-random planes
  *    (xxhash64-derived coefficients), vectors bucketed by signature;
  *    a query probes only its bucket (and optionally neighbors) then
  *    reranks exactly. At 100 TB the bucket table is written partitioned
  *    by signature, so a probe is a partition-pruned scan — the scale path.
  */
object Similarity {

  /** Dot product of two double arrays — the custom codegen'd expression
    * [[graft.expr.DotProduct]]: higher-order-function folds are
    * CodegenFallback (interpreted, boxed) and dominate quadratic
    * similarity joins; the native expression is a primitive loop inside
    * whole-stage codegen. Summation is in index order, bit-for-bit equal
    * to a sequential oracle.
    */
  def dot(a: Column, b: Column): Column = graft.expr.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def toDouble(arr: Column): Column = transform(arr, x => x.cast("double"))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector symmetric int8 quantization — the memory lever for ANN at
    * 10⁹⁺ vectors: a 64-dim float payload shrinks 4× (one byte per
    * component + one scale), which is what keeps a scan-side candidate
    * pass or an IVF verify side in memory when full floats would spill.
    * Direction is preserved (the scale cancels in cosine), so quantized
    * cosine ranks candidates and an exact float rerank of the short list
    * restores true scores — the standard two-stage shape (q84 registers
    * it end-to-end under a DuckDB oracle). Deterministic cross-engine:
    * abs/max are exact, the scale division and round-half-up land
    * identically in any IEEE engine, and quantized dot products are exact
    * small integers.
    */
  def int8Scale(e: Column): Column = array_max(transform(e, x => abs(x)))

  def quantizeInt8(e: Column, scale: Column): Column =
    transform(e, x => round(x * 127 / scale).cast("int"))

  /** Brute-force cosine top-k against one query vector. */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val e = toDouble(col(embCol))
    df.select(col(idCol), cosine(e, q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** LSH signature: `numPlanes` sign bits packed into a long — the fused
    * codegen'd [[graft.expr.HyperplaneSig]] (the equivalent nested
    * higher-order-function formulation is CodegenFallback: interpreted,
    * boxed, two accumulator arrays allocated per plane per row;
    * `ExprParitySpec` pins the native expression bit-equal to it).
    */
  def lshSignature(emb: Column, dim: Int, numPlanes: Int): Column =
    graft.expr.HyperplaneSig(emb, dim, numPlanes)

  /** md5-derived hyperplane coefficients: c(j,i) = 2·u − 1 with u the
    * 60-bit integer of the first 15 md5 hex chars of "plane:j:i", scaled
    * to [0,1) — the ORACLE-RESTATABLE plane family (any engine with md5
    * recomputes the planes bit-for-bit; the fused xxhash64
    * [[lshSignature]] stays the throughput form). Computed once on the
    * driver — numPlanes×dim doubles, folded into the plan as literals.
    */
  def md5Planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { j =>
      (0 until dim).map { i =>
        val hex = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60).toDouble * 2 - 1
      }.toSeq
    }.toSeq
  }

  /** Packed sign-bit signature on an explicit plane family: bit j set when
    * dot(emb, planes(j)) > 0 — the fused codegen'd
    * [[graft.expr.MaterializedPlaneSig]] (index-order summation, bit-equal
    * on NON-NULL input to the one-DotProduct-per-plane composition it
    * replaced, which blew past Janino's method-size limit at 60 planes ×
    * 64 dims and dropped the projection out of whole-stage codegen;
    * `ExprParitySpec` pins the equivalence). One semantic difference: a
    * NULL embedding now yields a NULL signature (standard null
    * propagation) where the composed when/otherwise form yielded 0L —
    * every caller feeds non-null vectors, and dropping a NULL vector
    * from LSH candidate sets is the saner contract anyway.
    */
  def planeSignature(emb: Column, planes: Seq[Seq[Double]]): Column =
    graft.expr.MaterializedPlaneSig(emb, planes)

  /** Exact cosine nearest-neighbor join: for every vector, its top
    * neighbor — the embedding-cosine near-dup primitive (candidates for
    * dedup review are pairs whose nn cosine exceeds a threshold).
    *
    * Unit vectors are computed once behind a shared exchange, so the
    * pairwise stage is pure dot products; the per-vector argmax is a
    * `max_by` GROUP-BY, not a window: partial aggregation collapses each
    * partition's candidates map-side, so the only shuffle carries one row
    * per (vector × partition) instead of every candidate pair — at n²
    * candidates that is the difference between shuffling n rows and n².
    * Tie-break (equal cos → smaller id) matches the old window ordering
    * via the lexicographic (cos, −id) max key. Quadratic by construction —
    * the exact baseline; at 100 TB bucket first (lshSignature) and run
    * this within buckets, trading recall for the cross product.
    */
  def nnJoin(df: DataFrame, embCol: String, idCol: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    val unit = unitVectors(df, embCol, idCol).repartition(parts)
    val a = unit.select(col("id").as("id_a"), col("u").as("u_a"))
    val b = unit.select(col("id").as("id_b"), col("u").as("u_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cos"))
      .groupBy(col("id_a"))
      .agg(max_by(struct(col("id_b"), col("cos")),
        struct(col("cos"), -col("id_b"))).as("m"))
      .select(col("id_a").as("vec_id"), col("m.id_b").as("nn_id"),
        round(col("m.cos"), 6).as("cos"))
  }

  /** Spherical k-means centroids for IVF, trained on the driver over a
    * DETERMINISTIC sample: rows ordered by `xxhash64(id)` (a seedless
    * pseudo-random but reproducible shuffle), first `sampleSize` taken,
    * normalized to unit length, k-means with dot-product assignment for
    * `iters` Lloyd rounds (init = first k of the sample). Driver memory is
    * O(sampleSize·dim) doubles — megabytes — and the result is K×dim,
    * kilobytes, shipped to executors inside the plan. This is the standard
    * IVF split: train on a sample centrally, assign distributed.
    */
  def trainCentroids(df: DataFrame, embCol: String, idCol: String,
                     k: Int, sampleSize: Int = 2048, iters: Int = 5): Seq[Seq[Double]] = {
    val rows = df
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .select(toDouble(col(embCol)))
      .collect() // bounded: sampleSize × dim doubles on the driver, by design
      .map(_.getSeq[Double](0).toArray)
    require(rows.length >= k, s"need at least $k sample vectors, got ${rows.length}")
    val dim = rows(0).length
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample = rows.map(unit)
    var cents = sample.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var s = 0.0; var i = 0
          while (i < dim) { s += v(i) * cents(c)(i); i += 1 }
          if (s > bestDot) { bestDot = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else unit(sums(c))
      }
    }
    cents.map(_.toSeq).toSeq
  }

  /** IVF approximate nearest-neighbor JOIN: every vector searches the
    * members of its `nprobe` nearest centroid cells and keeps the best
    * match — the scale path for the embedding-near-dup primitive (q29's
    * exact [[nnJoin]] stays as the oracle-checked baseline).
    *
    * Why IVF rather than LSH buckets for the JOIN form: hyperplane-LSH
    * collision probability at the cosine levels a top-1 neighbor has on
    * isotropic data (~0.5 → θ≈60°) is (1−θ/π)^planes ≈ 0.66^planes —
    * vanishing for any signature wide enough to keep buckets small, so a
    * bucketed nnJoin returns near-zero recall or degenerates to brute
    * force. IVF-nprobe instead gives a smooth compute/recall dial
    * (cost ≈ nprobe/K of brute force) and keeps working when the corpus
    * HAS cluster structure (real-world embeddings), where its recall is
    * far higher than on this synthetic isotropic data.
    *
    * Plan shape: unit vectors computed once; one [[graft.expr.NearestCells]]
    * projection serves both sides (element 0 = home cell = membership;
    * exploded = probes); candidates come from an EQUI-join on the cell id
    * (each (query, member) pair arises at most once because a member has
    * one home cell); per-query argmax is a map-side-combining `max_by`
    * group-by (see [[nnJoin]] — the shuffle carries surviving best rows,
    * never candidate pairs). No cartesian product anywhere. The cell-id
    * join key has only K distinct values, so K caps the join's
    * parallelism AND the per-cell candidate product — K must scale with
    * the corpus (K ≈ √n keeps cells ≈ √n; [[ivfParams]] computes that)
    * and AQE's skew-join handles residual imbalance at the 100 TB end.
    *
    * SCALE BOUND of the flat assignment: [[graft.expr.NearestCells]]
    * scans all K centroids per row, so the assignment projection costs
    * O(K·dim) = O(√n·dim) multiplies per row — ~2M at n = 10⁹ (K ≈ 32k,
    * dim 64). Fine at every testable SF; at the 10⁹⁺-vector end pass
    * `routing` (from [[trainSuperCells]] + [[routingParams]]) to switch
    * the same projection to [[graft.expr.RoutedNearestCells]]: S ≈ √K
    * super-cells route each row to its `superProbe` nearest supers, whose
    * children alone are ranked — O((S + superProbe·K/S)·dim) ≈
    * O(n^0.25·dim) per row with the identical join/argmax shape above it.
    * With superProbe = S the routed output is spec-pinned EQUAL to the
    * flat one, so the dial starts from exactness.
    */
  /** Group trained cell centroids under `superK` super-cells: spherical
    * k-means over the K cell vectors (init = first superK cells, dot
    * assignment, same Lloyd loop as [[trainCentroids]] — driver-side,
    * O(K·superK·dim·iters), microseconds at any realistic K). Empty
    * supers are dropped, so every returned super has at least one child
    * and the two-level probe can never strand a vector with zero
    * candidate cells. Returns (superCentroids, childCellIdsPerSuper).
    */
  def trainSuperCells(cells: Seq[Seq[Double]], superK: Int,
                      iters: Int = 5): (Seq[Seq[Double]], Seq[Seq[Int]]) = {
    require(cells.nonEmpty, "cells must be non-empty")
    val k = math.min(superK, cells.length)
    val arr = cells.map(_.toArray).toArray
    val dim = arr(0).length
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i) * cents(c)(i); i += 1 }
        if (s > bd) { bd = s; best = c }
        c += 1
      }
      best
    }
    var sup = arr.take(k).map(u => unit(u.clone))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      arr.foreach { v =>
        val s = nearest(v, sup)
        var i = 0
        while (i < dim) { sums(s)(i) += v(i); i += 1 }
        counts(s) += 1
      }
      sup = sup.zipWithIndex.map { case (old, s) =>
        if (counts(s) == 0) old else unit(sums(s))
      }
    }
    val assign = arr.map(nearest(_, sup))
    val grouped = (0 until k).map(s => arr.indices.filter(assign(_) == s).toSeq)
    val nonEmpty = grouped.zipWithIndex.filter(_._1.nonEmpty)
    (nonEmpty.map { case (_, s) => sup(s).toSeq }, nonEmpty.map(_._1))
  }

  /** Two-level routing sizes for K cells: S ≈ √K supers, probe ⌈S/2⌉ —
    * the assignment-side analogue of the nprobe/K search dial.
    */
  def routingParams(k: Int): (Int, Int) = {
    val s = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    (s, math.max(2, (s + 1) / 2))
  }

  /** NN join with distinct query and corpus sides: for every `queries`
    * vector, its best `corpus` neighbor (self excluded by id). Same
    * map-side-combining `max_by` shape as [[nnJoin]]; quadratic in
    * |queries|×|corpus| by construction — the audit-artifact form
    * (q89 samples the query side so the exact audit stays runnable as
    * the corpus grows; the corpus side is never sampled, keeping the
    * denominator honest).
    */
  def nnJoinAgainst(queries: DataFrame, corpus: DataFrame,
                    embCol: String, idCol: String): DataFrame = {
    val parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    def unitOf(df: DataFrame) = unitVectors(df, embCol, idCol)
    val a = unitOf(queries).select(col("id").as("id_a"), col("u").as("u_a"))
    val b = unitOf(corpus).repartition(parts)
      .select(col("id").as("id_b"), col("u").as("u_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cos"))
      .groupBy(col("id_a"))
      .agg(max_by(struct(col("id_b"), col("cos")),
        struct(col("cos"), -col("id_b"))).as("m"))
      .select(col("id_a").as("vec_id"), col("m.id_b").as("nn_id"),
        round(col("m.cos"), 6).as("cos"))
  }

  /** `int8Shortlist = Some(m)`: the candidate join runs on per-vector
    * int8 quantizations ([[quantizeInt8]] over the unit vectors, carried
    * as `array<tinyint>` — the 4× memory lever of q84 applied to the IVF
    * join's exchange and build side), keeps the top-`m` candidates per
    * query by quantized cosine (a per-query WindowGroupLimit — the
    * per-partition top-m prunes before the shuffle), and reranks the
    * shortlist with the TRUE float cosine via two keyed fetches of the
    * unit vectors. At 10⁹ vectors this is what keeps the per-cell
    * candidate pass in executor memory; recall vs the float path is
    * spec-pinned in SimilaritySpec. Default `None` is the exact float
    * path — q74's nprobe=K degeneration contract is unchanged.
    */
  def ivfNnJoin(df: DataFrame, embCol: String, idCol: String,
                centroids: Seq[Seq[Double]], nprobe: Int,
                routing: Option[(Seq[Seq[Double]], Seq[Seq[Int]], Int)] = None,
                int8Shortlist: Option[Int] = None): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    // Normalization + cell assignment happen BELOW one repartition, and
    // the cells array is POSEXPLODED once before the consumers branch:
    // members = rank 0 (the home cell), probes = all ranks. Both
    // consumers' extra predicates (rank = 0, join-key null checks) bind to
    // GENERATED columns, so they cannot push below the Generate — the
    // exchange subtrees stay byte-identical and ReuseExchange computes the
    // scan + unit vectors + NearestCells exactly once.
    val assign: Column => Column = routing match {
      case Some((sup, kids, superProbe)) =>
        // trainSuperCells drops empty supers, so it can return fewer than
        // routingParams sized for — clamp here so every caller composes
        // the two safely (RoutedNearestCells requires superProbe <= |sup|)
        val probe = math.min(superProbe, sup.length)
        u => graft.expr.RoutedNearestCells(u, sup, centroids, kids, nprobe, probe)
      case None =>
        u => graft.expr.NearestCells(u, centroids, nprobe)
    }
    int8Shortlist match {
      case None =>
        val exploded = unitVectors(df, embCol, idCol)
          .select(col("id"), col("u"), assign(col("u")).as("cells"))
          .repartition(parts)
          .select(col("id"), col("u"), posexplode(col("cells")))
          .withColumnsRenamed(Map("pos" -> "rank", "col" -> "cell"))
        val members = exploded.filter(col("rank") === 0)
          .select(col("cell"), col("id"), col("u"))
        val probes = exploded.select(
          col("cell"), col("id").as("qid"), col("u").as("qu"))
        probes.join(members, "cell")
          .filter(col("qid") =!= col("id"))
          .select(col("qid"), col("id"), dot(col("qu"), col("u")).as("cos"))
          .groupBy(col("qid"))
          .agg(max_by(struct(col("id"), col("cos")),
            struct(col("cos"), -col("id"))).as("m"))
          .select(col("qid").as("vec_id"), col("m.id").as("nn_id"),
            round(col("m.cos"), 6).as("cos"))

      case Some(m) =>
        import org.apache.spark.sql.expressions.Window
        // the exchange and candidate join carry array<tinyint> + one
        // precomputed quantized norm — floats never enter the wide stage
        val exploded = unitVectors(df, embCol, idCol)
          .select(col("id"), col("u"), assign(col("u")).as("cells"))
          .withColumn("qv",
            quantizeInt8(col("u"), int8Scale(col("u"))).cast("array<tinyint>"))
          .withColumn("qn", norm(toDouble(col("qv"))))
          .select(col("id"), col("qv"), col("qn"), col("cells"))
          .repartition(parts)
          .select(col("id"), col("qv"), col("qn"), posexplode(col("cells")))
          .withColumnsRenamed(Map("pos" -> "rank", "col" -> "cell"))
        val members = exploded.filter(col("rank") === 0)
          .select(col("cell"), col("id"), col("qv"), col("qn"))
        val probes = exploded.select(col("cell"), col("id").as("qid"),
          col("qv").as("qqv"), col("qn").as("qqn"))
        // quantized cosine ranks candidates; quantized dots are exact
        // small integers, so the shortlist cut is deterministic
        val wq = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("id"))
        val shortlist = probes.join(members, "cell")
          .filter(col("qid") =!= col("id"))
          .select(col("qid"), col("id"),
            (dot(toDouble(col("qqv")), toDouble(col("qv")))
              / (col("qqn") * col("qn"))).as("qcos"))
          .withColumn("r", row_number().over(wq))
          .filter(col("r") <= m)
          .select(col("qid"), col("id"))
        // exact rerank: fetch the float unit vectors for the shortlist
        // pairs only (two keyed joins, shortlist-sized)
        val unitv = unitVectors(df, embCol, idCol)
        shortlist
          .join(unitv.select(col("id").as("qid"), col("u").as("uq")), "qid")
          .join(unitv.select(col("id"), col("u").as("um")), "id")
          .select(col("qid"), col("id"), dot(col("uq"), col("um")).as("cos"))
          .groupBy(col("qid"))
          .agg(max_by(struct(col("id"), col("cos")),
            struct(col("cos"), -col("id"))).as("m"))
          .select(col("qid").as("vec_id"), col("m.id").as("nn_id"),
            round(col("m.cos"), 6).as("cos"))
    }
  }

  /** IVF sizing from the corpus count: K ≈ √n cells (each cell ≈ √n
    * members, so total candidate work ≈ nprobe·n^1.5/K ≈ nprobe·n — linear
    * in the corpus) probing ⌈K/8⌉ cells, floored so tiny inputs keep
    * enough cells for a meaningful approximation and enough probes for
    * recall. One metadata-cheap `count()` job.
    */
  def ivfParams(df: DataFrame): (Int, Int) = {
    val n = df.count()
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    (k, math.max(4, k / 8))
  }

  /** Deterministic, SQL-RESTATABLE IVF centroids for the hash-checked
    * recall artifacts (q82/q89): the unit-normalized embedding vectors of
    * every id divisible by ⌈√n⌉, in id order. Unlike [[trainCentroids]]
    * (Lloyd iterations over an engine-ordered sample — inherently
    * non-restatable, which is why q33 stays rows-only), every step here is
    * integer arithmetic a DuckDB oracle recomputes verbatim, so the recall
    * number itself lands under the driver's hash gate: a recall regression
    * fails CORRECTNESS instead of degrading silently. K ≈ n/⌈√n⌉ ≈ √n
    * keeps the ivfParams cell geometry; nprobe = K/4 (clamped to [4, K]) —
    * wider than ivfParams' trained K/8 dial because unlloyd'd seeds have
    * worse cell geometry, and the artifact's spec floor (recall ≥ 0.5)
    * must hold at every SF; still a 4× candidate-work saving. Driver
    * memory: K×dim doubles — kilobytes, same bound as trainCentroids.
    */
  def seedCentroids(df: DataFrame, embCol: String, idCol: String): (Seq[Seq[Double]], Int) = {
    val n = df.count()
    val mod = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val rows = df.filter(col(idCol) % mod === 0)
      .orderBy(col(idCol))
      .select(toDouble(col(embCol)))
      .collect() // bounded: ~√n × dim doubles on the driver, by design
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "seedCentroids: empty corpus")
    def unit(v: Array[Double]): Array[Double] = {
      val nm = math.sqrt(v.map(x => x * x).sum)
      if (nm == 0) v else v.map(_ / nm)
    }
    val cents = rows.map(u => unit(u).toSeq).toSeq
    (cents, math.min(cents.length, math.max(4, cents.length / 4)))
  }

  /** Deterministic, SQL-RESTATABLE two-level routing over a SEED centroid
    * list — the routed analogue of [[seedCentroids]], so the full
    * production assignment shape (super-cells → children-only ranking,
    * [[graft.expr.RoutedNearestCells]]) can run under a DuckDB hash
    * oracle at a real approximation dial instead of only in its
    * probe-everything degeneration. Supers = every ⌈√K⌉-th centroid of
    * the id-ordered seed list (already unit vectors); each centroid is
    * assigned to its nearest super by dot, descending, ties to the
    * smaller super ordinal — exactly [[graft.expr.NearestCells.selectTop]]'s
    * rule, so an oracle restates the kid lists with one windowed argmax.
    * superProbe mirrors [[routingParams]]' ⌈S/2⌉ dial, clamped to S.
    * Unlike [[trainSuperCells]] (driver k-means — non-restatable), every
    * step is integer selection plus one argmax.
    */
  def seedSuperCells(cents: Seq[Seq[Double]]): (Seq[Seq[Double]], Seq[Seq[Int]], Int) = {
    require(cents.nonEmpty, "seedSuperCells: empty centroid list")
    val smod = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val supIdx = cents.indices.filter(_ % smod == 0)
    val sup = supIdx.map(cents)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      val d = math.min(a.length, b.length)
      while (i < d) { s += a(i) * b(i); i += 1 }
      s
    }
    val kids = Array.fill(sup.length)(Seq.newBuilder[Int])
    cents.indices.foreach { c =>
      var best = 0; var bd = Double.NegativeInfinity
      sup.indices.foreach { s =>
        val d = dot(cents(c), sup(s))
        if (d > bd) { bd = d; best = s } // strict > keeps the smaller ordinal on ties
      }
      kids(best) += c
    }
    val superProbe = math.min(sup.length, math.max(2, (sup.length + 1) / 2))
    (sup, kids.map(_.result()).toSeq, superProbe)
  }

  /** ANN search: probe buckets whose signature is within `maxHammingProbe`
    * of the query signature (0 = exact bucket), rerank candidates exactly,
    * return top-k. Candidate set is the probed buckets only — the scan is
    * partition-prunable when the table is written partitioned by `sig`.
    */
  def annTopK(df: DataFrame, embCol: String, idCol: String,
              query: Seq[Double], k: Int, dim: Int,
              numPlanes: Int = 12, maxHammingProbe: Int = 1): DataFrame = {
    val withSig = df.withColumn("__sig", lshSignature(col(embCol), dim, numPlanes))
    // query signature computed with the same plan expression on one row
    val qDf = df.sparkSession.range(1)
      .select(array(query.map(lit): _*).as("q"))
      .select(lshSignature(col("q"), dim, numPlanes).as("qsig"))
    val qsig = qDf.head().getLong(0) // driver-side scalar: one 8-byte value
    val cands = withSig.filter(Dedup.hamming(col("__sig"), lit(qsig)) <= maxHammingProbe)
    bruteForceTopK(cands, embCol, idCol, query, k)
  }

  /** [[annTopK]] on the md5 plane family ([[md5Planes]]): identical
    * probe-then-exact-rerank shape and scale story (bucket signatures are
    * partition-prunable keys), but every stage — plane coefficients,
    * signatures, hamming probe, cosine rerank — is restatable in SQL,
    * which is what moves the ANN query from rows-only to hash-checked.
    */
  def annTopKMd5(df: DataFrame, embCol: String, idCol: String,
                 query: Seq[Double], k: Int, dim: Int,
                 numPlanes: Int = 12, maxHammingProbe: Int = 1): DataFrame = {
    val planes = md5Planes(numPlanes, dim)
    val withSig = df.withColumn("__sig", planeSignature(toDouble(col(embCol)), planes))
    // driver-side query signature: same ascending-index fold as DotProduct
    val qsig = planes.zipWithIndex.foldLeft(0L) { case (acc, (p, j)) =>
      val d = p.zip(query).foldLeft(0.0) { case (s, (c, x)) => s + c * x }
      if (d > 0) acc | (1L << j) else acc
    }
    val cands = withSig.filter(Dedup.hamming(col("__sig"), lit(qsig)) <= maxHammingProbe)
    bruteForceTopK(cands, embCol, idCol, query, k)
  }

  /** The `bands` × `rowsPerBand`-bit slices of a packed sign signature,
    * as an array of (band, bits) structs ready to explode — shared by
    * [[cosineNearDupPairs]] and the persisted index build/probe, which
    * must slice identically for their buckets to collide.
    */
  private[scale] def signBands(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val mask = (1L << rowsPerBand) - 1
    array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        shiftright(sig, j * rowsPerBand).bitwiseAND(lit(mask)).as("bits"))
    }: _*)
  }

  /** One unit-vector projection: (id, u) with u = e/‖e‖ in double, via
    * the codegen'd [[graft.expr.UnitVector]] — the norm computed ONCE
    * per row in a primitive loop. (The earlier declarative hoist — alias
    * the norm, divide in a lambda — was a no-op: CollapseProject inlines
    * a single-use alias back into the transform lambda, re-evaluating
    * the O(dim) norm per ELEMENT, interpreted. Division values are
    * bit-identical either way, so oracle parity is unaffected.)
    */
  private def unitVectors(df: DataFrame, embCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.expr.UnitVector(toDouble(col(embCol))).as("u"))

  /** Embedding-cosine near-dup PAIRS — the embedding analog of
    * [[graft.scale.Dedup.minhashPairs]]: banded hyperplane-LSH candidates,
    * exact-cosine verified. Completes the dedup family (exact / MinHash /
    * SimHash / n-gram Jaccard / embedding-cosine) with the same
    * two-stage never-all-pairs shape:
    *
    *  1. one unit-vector projection per row (computed once, shared);
    *  2. a 60-bit sign signature on the [[md5Planes]] family (the fused
    *     codegen'd [[graft.expr.MaterializedPlaneSig]] — O(planes·dim)
    *     multiplies per row, trivial beside any shuffle);
    *  3. band explode (`bands` × `rowsPerBand`-bit keys) and an equi-join
    *     on (band, bits) — only same-bucket pairs are ever materialized.
    *     A bucket-size window prefilter drops singleton buckets before
    *     the join (most of the corpus: isotropic vectors spread over
    *     2^rowsPerBand buckets per band);
    *  4. exact verify: candidate ids fetch their unit vectors back (two
    *     id-keyed joins — the candidate set, not the corpus, pays the
    *     shuffle) and keep pairs with true cosine ≥ `threshold`.
    *
    * Near-dup pairs (θ small) flip a sign bit with probability θ/π per
    * plane, so a band of r bits matches with prob (1−θ/π)^r and the pair
    * is missed only if ALL `bands` bands differ — at cosine ≥ 0.99
    * (θ ≤ 0.15) the miss probability is < 1e-6 per pair; the whole
    * pipeline is deterministic (md5 planes, fixed data), so recall on a
    * given corpus is a checkable constant, not a random variable —
    * SimilaritySpec pins it at 1.0 against brute force, which is what
    * lets q95 run under a brute-force DuckDB oracle (the q16 contract).
    * At 100 TB the bucket join carries only (band, bits, id) — 20
    * bytes/row×bands — and oversized buckets (mass near a hyperplane
    * intersection) salt into chunks of ≤ `maxBucketSize` exactly as
    * [[graft.scale.Dedup.minhashPairs]] salts; on isotropic data buckets
    * stay far below the cap and the salt is the identity.
    */
  def cosineNearDupPairs(df: DataFrame, embCol: String, idCol: String,
                         threshold: Double, dim: Int,
                         numPlanes: Int = 60, bands: Int = 6,
                         maxBucketSize: Int = 1024): DataFrame = {
    require(numPlanes % bands == 0, "numPlanes must divide into bands")
    require(numPlanes <= 63, "signature is packed into one long")
    val rowsPerBand = numPlanes / bands
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    val planes = md5Planes(numPlanes, dim)
    val unit = unitVectors(df, embCol, idCol).repartition(parts)
    val sigs = unit.select(col("id"), planeSignature(col("u"), planes).as("sig"))
    // oversized buckets (mass near a hyperplane intersection) salt into
    // chunks of ≤ maxBucketSize with an observed oversized count — the
    // ONE implementation minhashPairs uses ([[Dedup.saltedBucketKeys]])
    val buckets = Dedup.saltedBucketKeys(
      sigs.select(col("id"), explode(signBands(col("sig"), bands, rowsPerBand)).as("b")),
      "cosine_lsh", maxBucketSize)
    val cand = buckets.select(col("bk").as("lb"), col("id").as("id_a"))
      .join(buckets.select(col("bk").as("rb"), col("id").as("id_b")),
        col("lb") === col("rb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .repartition(parts)
      .join(unit.select(col("id").as("id_a"), col("u").as("u_a")), "id_a")
      .join(unit.select(col("id").as("id_b"), col("u").as("u_b")), "id_b")
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Persisted cosine-LSH index — [[graft.scale.Dedup.buildMinhashIndex]]'s
    * amortized-ingestion contract on the embedding surface: pay the
    * corpus unit-vector + signature pass ONCE, persist the artifacts
    * BUCKETED on their join keys, and let every ingestion batch probe at
    * O(batch + candidates) with zero corpus-side compute and zero
    * corpus-side shuffle ([[probeCosineIndex]]). Two bucketed tables:
    *  - `<name>_buckets` (bband, bbits, id) bucketed by bbits — the
    *    candidate equi-join side (20 bytes/row × bands);
    *  - `<name>_units`   (id, u)            bucketed by id — unit
    *    vectors for the exact-cosine verify, fetched candidate-sized
    *    (the point-lookup pattern), never corpus-wide.
    * Parquet round-trips doubles bit-exactly, so a verify against stored
    * units equals a verify against live ones. [[appendToCosineIndex]]
    * keeps the index tracking the corpus at O(batch) per increment.
    */
  def buildCosineIndex(corpus: DataFrame, embCol: String, idCol: String,
                       name: String, dim: Int, numPlanes: Int = 60,
                       bands: Int = 6, numBuckets: Int = 16): Unit = {
    require(numPlanes % bands == 0 && numPlanes <= 63)
    val rowsPerBand = numPlanes / bands
    val planes = md5Planes(numPlanes, dim)
    val units = unitVectors(corpus, embCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.sources.Sources.writeBucketed(units, s"${name}_units", Seq("id"), numBuckets)
      graft.sources.Sources.writeBucketed(
        units.select(col("id"), planeSignature(col("u"), planes).as("sig"))
          .select(col("id"), explode(signBands(col("sig"), bands, rowsPerBand)).as("b"))
          .select(col("b.band").as("bband"), col("b.bits").as("bbits"), col("id")),
        s"${name}_buckets", Seq("bbits"), numBuckets)
    } finally units.unpersist()
  }

  /** Cosine-index maintenance — [[graft.scale.Dedup.appendToMinhashIndex]]'s
    * repeated-increment contract for the embedding index: bucketed
    * INSERTs of the ACCEPTED batch rows' band buckets and unit vectors,
    * so every daily increment stays O(batch) and the co-located bucketed
    * join layout survives (Spark validates the bucket spec on append).
    *
    * Idempotent: ids already indexed are anti-joined away first, so
    * re-ingesting a replayed batch appends nothing. Write order matters,
    * for the same two reasons as the minhash index's keys-LAST rule:
    * `_units` is the anti-join table, so it goes LAST — (a) every write
    * re-executes this lazy plan, and a recompute during the second write
    * must still see the pre-append id set; (b) a torn append (buckets
    * landed, units not) self-heals on rerun — the anti-join still sees
    * those ids as fresh and re-appends everything, and the only artifact
    * is duplicate bucket rows, which collapse in the probe's candidate
    * `.distinct()`. Units-FIRST would strand a torn batch's ids as
    * indexed-but-bucketless: never candidates, invisible to every future
    * probe. (During the torn window itself a candidate without its unit
    * row drops at the verify join — a transient miss the rerun heals;
    * SimilaritySpec pins append ≡ rebuild and idempotent re-ingest.)
    *
    * CONTRACT (as [[graft.scale.Dedup.appendToMinhashIndex]]): `accepted`
    * must not be a live plan that READS the tables this call mutates;
    * land accepted rows in the corpus store (or derive them from a
    * collected id list) first. `dim`/`numPlanes`/`bands`/`numBuckets`
    * must match the build.
    */
  def appendToCosineIndex(accepted: DataFrame, embCol: String, idCol: String,
                          name: String, dim: Int, numPlanes: Int = 60,
                          bands: Int = 6, numBuckets: Int = 16): Unit = {
    // same validation as the build: a silently-truncating rowsPerBand
    // would emit band keys that never match the stored ones — every
    // future probe would find zero candidates instead of failing here
    require(numPlanes % bands == 0 && numPlanes <= 63)
    val spark = accepted.sparkSession
    val rowsPerBand = numPlanes / bands
    val planes = md5Planes(numPlanes, dim)
    val fresh = unitVectors(accepted, embCol, idCol)
      .join(spark.table(s"${name}_units").select(col("id")), Seq("id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.sources.Sources.writeBucketed(
        fresh.select(col("id"), planeSignature(col("u"), planes).as("sig"))
          .select(col("id"), explode(signBands(col("sig"), bands, rowsPerBand)).as("b"))
          .select(col("b.band").as("bband"), col("b.bits").as("bbits"), col("id")),
        s"${name}_buckets", Seq("bbits"), numBuckets,
        org.apache.spark.sql.SaveMode.Append)
      graft.sources.Sources.writeBucketed(fresh,
        s"${name}_units", Seq("id"), numBuckets,
        org.apache.spark.sql.SaveMode.Append)
    } finally fresh.unpersist()
  }

  /** Brute-force cross-pair audit leg: every (corpus id, batch id) pair
    * with TRUE cosine ≥ `threshold` — quadratic BY DESIGN, the exact
    * baseline a recall artifact (q103) measures the LSH path against,
    * exactly as [[nnJoin]] is q82's exact leg. Same non-equi join shape
    * as [[nnJoinAgainst]] (broadcast NL, never a cartesian plan node);
    * at scale the audit cost dials down by md5-sampling the BATCH side
    * (the q89 move) — the production probe being audited is untouched.
    */
  def crossPairsAbove(corpus: DataFrame, batch: DataFrame, embCol: String,
                      idCol: String, threshold: Double): DataFrame = {
    val parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    val a = unitVectors(corpus, embCol, idCol).repartition(parts)
      .select(col("id").as("id_a"), col("u").as("u_a"))
    val b = unitVectors(batch, embCol, idCol)
      .select(col("id").as("id_b"), col("u").as("u_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Compact the cosine index — [[graft.scale.Dedup.compactMinhashIndex]]'s
    * maintenance move for this family: crash-safe bucketed rewrite of
    * `_buckets`/`_units` ([[graft.sources.Sources.compactTable]]) that
    * repays the per-append small-files debt and drops the duplicate
    * bucket rows a torn append leaves behind. Probe-after-compact ≡
    * probe-before (SimilaritySpec). `numBuckets` must match the build.
    */
  def compactCosineIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                         numBuckets: Int = 16): Seq[graft.sources.Sources.CompactStats] = Seq(
    graft.sources.Sources.compactTable(spark, s"${name}_buckets", Seq("bbits"), numBuckets),
    graft.sources.Sources.compactTable(spark, s"${name}_units", Seq("id"), numBuckets))

  /** [[compactCosineIndex]] behind the debt policy — see
    * [[graft.scale.Dedup.compactMinhashIndexIfNeeded]].
    */
  def compactCosineIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
                                 name: String, numBuckets: Int = 16,
                                 maxFilesPerBucket: Int = 4): Seq[graft.sources.Sources.CompactStats] =
    Seq("buckets" -> "bbits", "units" -> "id").flatMap {
      case (t, c) => graft.sources.Sources.compactIfNeeded(
        spark, s"${name}_$t", Seq(c), numBuckets, maxFilesPerBucket)
    }

  /** Probe the persisted cosine index with one ingestion batch: returns
    * (id_a = corpus id, id_b = batch id, cos) for every cross pair with
    * true cosine ≥ `threshold`. O(batch + candidates): the only plane
    * projections are batch-side, candidates come from an equi-join
    * against the STORED band buckets, and the corpus contributes only
    * candidate-sized unit-vector point lookups — PlanAssertSpec pins
    * that the corpus source is never rescanned. `dim`/`numPlanes`/
    * `bands` must match the build.
    */
  def probeCosineIndex(batch: DataFrame, embCol: String, idCol: String,
                       name: String, dim: Int, threshold: Double,
                       numPlanes: Int = 60, bands: Int = 6): DataFrame = {
    // same validation as the build: mismatched banding against a stored
    // index would silently return zero candidates (= accept everything),
    // the worst possible failure mode for a dedup gate
    require(numPlanes % bands == 0 && numPlanes <= 63)
    val spark = batch.sparkSession
    val rowsPerBand = numPlanes / bands
    val planes = md5Planes(numPlanes, dim)
    val parts = spark.sparkContext.defaultParallelism * 2
    val idxUnits = spark.table(s"${name}_units")
    val idxBuckets = spark.table(s"${name}_buckets")
    val ub = unitVectors(batch, embCol, idCol).repartition(parts)
    val bb = ub
      .select(col("id"),
        explode(signBands(planeSignature(col("u"), planes), bands, rowsPerBand)).as("b"))
      .select(col("b.band").as("bband"), col("b.bits").as("bbits"), col("id").as("bid"))
    val cand = bb.join(idxBuckets.withColumnRenamed("id", "cid"), Seq("bband", "bbits"))
      .select(col("cid").as("id_a"), col("bid").as("id_b")).distinct()
    cand
      .join(idxUnits.select(col("id").as("id_a"), col("u").as("u_a")), "id_a")
      .join(ub.select(col("id").as("id_b"), col("u").as("u_b")), "id_b")
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Persisted IVF index — the train-once/probe-forever contract that
    * [[ivfNnJoin]]'s in-query training lacks: at 10⁹ vectors the k-means
    * pass and the corpus-wide assignment shuffle are paid ONCE at build
    * and every subsequent batch probes at O(batch·nprobe·cellsize) with
    * zero corpus-side compute. Two stored tables (the q97 cosine-index
    * layout applied to IVF):
    *  - `<name>_centroids` (cell, c) — K×dim doubles, kilobytes; read
    *    back to the driver per probe (the same bounded driver action as
    *    [[trainCentroids]]) and shipped inside the plan;
    *  - `<name>_cells` (cell, id, u) bucketed by cell — members with
    *    their unit vectors co-located on the probe equi-join key, so a
    *    probe shuffles only the batch side into the bucket layout.
    * Parquet round-trips doubles bit-exactly, so probing stored cells ≡
    * probing live assignments. Centroids are immutable after build —
    * [[appendToIvfIndex]] assigns new vectors to the nearest STORED
    * centroid (the standard IVF maintenance move; recall drifts only if
    * the data distribution drifts, and the remedy is a rebuild, which
    * this same function performs). Returns the trained centroids.
    */
  def buildIvfIndex(corpus: DataFrame, embCol: String, idCol: String,
                    name: String, k: Int, sampleSize: Int = 2048,
                    iters: Int = 5, numBuckets: Int = 16): Seq[Seq[Double]] = {
    val cents = trainCentroids(corpus, embCol, idCol, k, sampleSize, iters)
    buildIvfIndexWith(corpus, embCol, idCol, name, cents, numBuckets)
    cents
  }

  /** [[buildIvfIndex]] with a caller-supplied centroid matrix (e.g.
    * [[seedCentroids]] for the hash-checked maintenance artifact q105):
    * stores the given matrix and the corpus cell assignments, training
    * nothing — the build/append/probe contract is otherwise identical.
    */
  def buildIvfIndexWith(corpus: DataFrame, embCol: String, idCol: String,
                        name: String, cents: Seq[Seq[Double]],
                        numBuckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.sources.Sources.saveTable(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "c"),
      s"${name}_centroids")
    graft.sources.Sources.writeBucketed(
      cellAssignments(corpus, embCol, idCol, cents),
      s"${name}_cells", Seq("cell"), numBuckets)
  }

  /** The `_cells` row shape for one input set: (home cell, id, unit
    * vector) under the given centroid matrix — the write side of
    * [[buildIvfIndexWith]]/[[appendToIvfIndex]], exposed so q105 can
    * replay a partial append (the torn-append crash artifact that
    * compaction cleans) with exactly the writer's own deterministic rows.
    */
  def cellAssignments(df: DataFrame, embCol: String, idCol: String,
                      cents: Seq[Seq[Double]]): DataFrame =
    unitVectors(df, embCol, idCol)
      .select(element_at(graft.expr.NearestCells(col("u"), cents, 1), 1).as("cell"),
        col("id"), col("u"))

  /** The stored centroid matrix, driver-side: K×dim doubles, kilobytes —
    * the same bounded-by-design driver action as [[trainCentroids]]'s
    * sample collect. Cell order is the table's `cell` id, so expressions
    * built from it emit ids consistent with the stored assignments.
    */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       name: String): Seq[Seq[Double]] =
    spark.table(s"${name}_centroids").orderBy(col("cell"))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

  /** IVF-index maintenance: assign the accepted batch to the nearest
    * STORED centroids and bucketed-INSERT into `_cells` — O(batch) per
    * increment, centroids untouched. Idempotent: already-indexed ids are
    * anti-joined away first, so a replayed batch appends nothing. Crash
    * safety needs no write-ordering rule here (one mutable table): a torn
    * append leaves some ids indexed and some missing, and the rerun's
    * anti-join re-appends exactly the missing ones — convergent, with no
    * duplicate rows at all (unlike the two-table families' transient
    * duplicate buckets).
    *
    * CONTRACT (as [[appendToCosineIndex]]): `accepted` must not be a live
    * plan that reads `<name>_cells`; `numBuckets` must match the build.
    */
  def appendToIvfIndex(accepted: DataFrame, embCol: String, idCol: String,
                       name: String, numBuckets: Int = 16): Unit = {
    val spark = accepted.sparkSession
    val cents = loadIvfCentroids(spark, name)
    graft.sources.Sources.writeBucketed(
      cellAssignments(
        accepted.join(
          spark.table(s"${name}_cells").select(col("id").as(idCol)),
          Seq(idCol), "left_anti"),
        embCol, idCol, cents),
      s"${name}_cells", Seq("cell"), numBuckets,
      org.apache.spark.sql.SaveMode.Append)
  }

  /** Compact the IVF cells table after many appends — same maintenance
    * move as [[compactCosineIndex]], one table: `_cells` is the only
    * growing side (`_centroids` is immutable and kilobytes). IVF appends
    * never duplicate rows (single-table anti-join), so this is purely
    * the small-files rewrite. `numBuckets` must match the build.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                      numBuckets: Int = 16): Seq[graft.sources.Sources.CompactStats] = Seq(
    graft.sources.Sources.compactTable(spark, s"${name}_cells", Seq("cell"), numBuckets))

  /** [[compactIvfIndex]] behind the debt policy — see
    * [[graft.scale.Dedup.compactMinhashIndexIfNeeded]].
    */
  def compactIvfIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
                              name: String, numBuckets: Int = 16,
                              maxFilesPerBucket: Int = 4): Seq[graft.sources.Sources.CompactStats] =
    graft.sources.Sources.compactIfNeeded(
      spark, s"${name}_cells", Seq("cell"), numBuckets, maxFilesPerBucket).toSeq

  /** Probe the persisted IVF index with one batch: each batch vector
    * searches the members of its `nprobe` nearest stored cells and keeps
    * its best corpus neighbor (self excluded by id) — (vec_id, nn_id,
    * cos), the [[nnJoinAgainst]] answer surface. O(batch): the batch side
    * computes unit vectors and an O(K·dim) [[graft.expr.NearestCells]]
    * routing per row, explodes to `nprobe` cell keys, and equi-joins the
    * bucketed `_cells` table on its bucket key — the stored side is
    * scanned in place, never shuffled, never signature-recomputed. The
    * per-query argmax is the map-side-combining `max_by` of [[nnJoin]].
    * At `nprobe` = K the candidate set is the full corpus and the result
    * is EXACTLY `nnJoinAgainst(batch, corpus)` — centroid quality drops
    * out entirely — which is what lets a registered query run the whole
    * stored-index path under a brute-force DuckDB oracle (the q74
    * pattern); partial-nprobe recall is spec-floored instead.
    */
  /** Near-duplicate screen on the persisted IVF index —
    * [[probeCosineIndex]]'s accept/reject surface served by centroid
    * routing instead of banded LSH: (id_a = stored member, id_b = batch
    * id, cos) for every cross pair whose true cosine reaches `threshold`,
    * candidates limited to each batch vector's `nprobe` nearest stored
    * cells. Same O(batch) probe shape as [[probeIvfIndex]]; the filter
    * compares the UNROUNDED dot product (exactly as probeCosineIndex
    * does), so at nprobe = K — where the candidate set is the full stored
    * corpus — the accept decision is EXACTLY the brute-force one, with no
    * banding-recall caveat at all: the one screening mode LSH cannot
    * offer. Ingest loops (q104) anti-join `id_b` out of the batch.
    */
  def matchedPairsIvfIndex(batch: DataFrame, embCol: String, idCol: String,
                           name: String, nprobe: Int,
                           threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val cents = loadIvfCentroids(spark, name)
    val probe = math.min(nprobe, cents.length)
    val parts = spark.sparkContext.defaultParallelism * 2
    val probes = unitVectors(batch, embCol, idCol).repartition(parts)
      .select(col("id").as("qid"), col("u").as("qu"),
        explode(graft.expr.NearestCells(col("u"), cents, probe)).as("cell"))
    probes.join(spark.table(s"${name}_cells"), "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("id").as("id_a"), col("qid").as("id_b"),
        dot(col("u"), col("qu")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  def probeIvfIndex(batch: DataFrame, embCol: String, idCol: String,
                    name: String, nprobe: Int): DataFrame = {
    val spark = batch.sparkSession
    val cents = loadIvfCentroids(spark, name)
    val probe = math.min(nprobe, cents.length)
    val parts = spark.sparkContext.defaultParallelism * 2
    val probes = unitVectors(batch, embCol, idCol).repartition(parts)
      .select(col("id").as("qid"), col("u").as("qu"),
        explode(graft.expr.NearestCells(col("u"), cents, probe)).as("cell"))
    probes.join(spark.table(s"${name}_cells"), "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), dot(col("qu"), col("u")).as("cos"))
      .groupBy(col("qid"))
      .agg(max_by(struct(col("id"), col("cos")),
        struct(col("cos"), -col("id"))).as("m"))
      .select(col("qid").as("vec_id"), col("m.id").as("nn_id"),
        round(col("m.cos"), 6).as("cos"))
  }
}
