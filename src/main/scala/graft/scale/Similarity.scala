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

  /** Brute-force cosine top-k against one query vector. */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val e = toDouble(col(embCol))
    df.select(col(idCol), cosine(e, q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane coefficient: plane j, dim i →
    * a value in [-1, 1) derived from xxhash64 — reproducible across runs,
    * no RNG state. j and i are runtime columns so the expression tree
    * stays SMALL: an unrolled dim×planes sum is a multi-hundred-term tree
    * that blows up janino compilation (tens of seconds of codegen).
    */
  private def planeCoef(j: Column, i: Column): Column =
    xxhash64(j * lit(100003) + i).cast("double") / lit(Long.MaxValue.toDouble)

  /** LSH signature: `numPlanes` sign bits packed into a long — computed
    * with nested higher-order functions (runtime loops, compact codegen).
    */
  def lshSignature(emb: Column, dim: Int, numPlanes: Int): Column = {
    val e = toDouble(emb)
    val dims = sequence(lit(0), lit(dim - 1))
    val bits = transform(sequence(lit(0), lit(numPlanes - 1)), j => {
      val d = aggregate(
        zip_with(e, dims, (x, i) => x * planeCoef(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L)).otherwise(lit(0L))
    })
    val masks = array((0 until numPlanes).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(bits, masks, (b, m) => when(b === 1L, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact cosine nearest-neighbor join: for every vector, its top
    * neighbor — the embedding-cosine near-dup primitive (candidates for
    * dedup review are pairs whose nn cosine exceeds a threshold).
    *
    * Unit vectors are computed once behind a shared exchange, so the
    * pairwise stage is pure dot products; the per-vector argmax is a
    * window on the id key (one shuffle). Quadratic by construction — the
    * exact baseline; at 100 TB bucket first (lshSignature) and run this
    * within buckets, trading recall for the cross product.
    */
  def nnJoin(df: DataFrame, embCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = df.sparkSession.sparkContext.defaultParallelism * 2
    val unit = df.select(col(idCol).as("id"), toDouble(col(embCol)).as("e"))
      .withColumn("u", transform(col("e"), x => x / norm(col("e"))))
      .select(col("id"), col("u"))
      .repartition(parts)
    val a = unit.select(col("id").as("id_a"), col("u").as("u_a"))
    val b = unit.select(col("id").as("id_b"), col("u").as("u_b"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("cos", dot(col("u_a"), col("u_b")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id_a").as("vec_id"), col("id_b").as("nn_id"),
        round(col("cos"), 6).as("cos"))
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
}
