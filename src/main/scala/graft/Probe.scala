package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.scale.Dedup

/** Dev-only stage profiler for the MinHash-LSH pipeline (q16). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $r")
      r
    }

    val (shingleK, numHashes, bands, threshold) = (3, 48, 6, 0.9)
    val rowsPerBand = numHashes / bands
    val parts = spark.sparkContext.defaultParallelism * 2
    val df = Tables(spark, sfDir, "documents")
    val docs = df.select(col("doc_id").as("id"), col("text"))
      .withColumn("ck", Dedup.contentKey(col("text")))
    val members = docs.select(col("ck"), col("id"))
    t("docs")(docs.count())
    val uniq = docs.groupBy(col("ck"))
      .agg(min(struct(col("id"), col("text"))).as("m"))
      .select(col("ck"), col("m.id").as("id"), col("m.text").as("text"))
    val enriched = uniq
      .withColumn("sh", array_sort(Dedup.shingles(col("text"), shingleK)))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))
      .withColumn("n", size(col("sh")))
      .select(col("ck"), col("id"), col("sh"), col("sig"), col("n"))
      .repartition(parts)
    t("enriched")(enriched.count())
    val buckets = enriched
      .select(col("id"), explode(Dedup.bandBuckets(col("sig"), bands, rowsPerBand)).as("b"))
      .withColumn("bs", count(lit(1)).over(Window.partitionBy(col("b"))))
    t("bucket size dist")(buckets.groupBy(col("bs")).count()
      .orderBy(col("bs").desc).collect().take(8).mkString(" "))
    val kept = buckets.filter(col("bs") <= 1024 && col("bs") >= 2).select(col("b"), col("id"))
    val cand = kept.select(col("b").as("lb"), col("id").as("id_a"))
      .join(kept.select(col("b").as("rb"), col("id").as("id_b")),
        col("lb") === col("rb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    t("candidates")(cand.count())
    val sigs = enriched.select(col("id"), col("sig"))
    val estimated = cand
      .repartition(parts)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .filter(graft.expr.SigAgreement(col("sig_a"), col("sig_b")) >= threshold - 0.15)
      .select(col("id_a"), col("id_b"))
    t("estimated")(estimated.count())
    val sets = enriched.select(col("id"), col("sh"), col("n"))
    val repPairs = estimated
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b")), "id_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .withColumn("sim", Dedup.jaccardWithSizes(col("sh_a"), col("sh_b"), col("n_a"), col("n_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
    t("repPairs")(repPairs.count())
    t("full minhashPairs")(Dedup.minhashPairs(df, "doc_id", "text",
      shingleK, numHashes, bands, threshold).count())
    t("full again (warm)")(Dedup.minhashPairs(df, "doc_id", "text",
      shingleK, numHashes, bands, threshold).count())
    spark.stop()
  }
}
