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

  test("shingles: sliding word windows, distinct; short docs fall back to whole text") {
    val df = Seq("a b c d", "x y").toDF("text")
    val out = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y"))
  }
}
