package graft.expr

import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftBridge

import graft.SparkSpec

/** Custom Catalyst expression: bit-exact FarmHash Fingerprint64. */
class FarmFingerprint64Spec extends SparkSpec {
  import spark.implicits._

  private def guava(s: String): Long =
    com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes(s.getBytes("UTF-8")).asLong()

  test("matches Guava FarmHashFingerprint64 bit-for-bit (codegen path)") {
    val inputs = Seq("", "a", "alex", "the quick brown fox", "тест-unicode-✓")
    val df = inputs.toDF("s")
    val got = df.select(FarmFingerprint64(col("s").cast("binary"))).as[Long].collect()
    assert(got.toSeq == inputs.map(guava))
  }

  test("NULL propagates; non-binary input rejected at analysis") {
    val df = Seq("x").toDF("s").withColumn("n", lit(null).cast("binary"))
    assert(df.select(FarmFingerprint64(col("n"))).head().isNullAt(0))
    val e = intercept[Exception] {
      Seq(1L).toDF("v").select(FarmFingerprint64(col("v"))).collect()
    }
    assert(e.getMessage.contains("BINARY") || e.getMessage.toLowerCase.contains("datatype"))
  }

  test("unsigned decimal rendering matches Python's unsigned int form") {
    // value with the high bit set → negative as signed long
    val df = Seq("alex").toDF("s")
    val sig = guava("alex")
    val rendered = df.select(conv(hex(FarmFingerprint64(col("s").cast("binary"))), 16, 10))
      .as[String].head()
    assert(rendered == java.lang.Long.toUnsignedString(sig))
  }

  test("GraftExtensions functions resolve and run from SQL") {
    GraftBridge.installFunctions(spark, new GraftExtensions())
    val row = spark.sql(
      """SELECT
        |  farm_fingerprint64(CAST('alex' AS BINARY)) AS fp,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  simhash64(array('a', 'b')) AS sh,
        |  shingle_hash_set(array('a', 'b', 'c'), 2) AS shs,
        |  minhash_shingles(array('a', 'b', 'c'), 2, 8) AS mh,
        |  hyperplane_sig(array(0.5D, -0.25D), 2, 12) AS hp,
        |  sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS isz,
        |  stopword_hits(array('the', 'cat', 'the'), array('the', 'a')) AS sw
        |""".stripMargin).head()
    assert(row.getLong(0) == guava("alex"))
    assert(row.getDouble(1) == 11.0)
    assert(row.getSeq[Long](3).size == 2) // two 2-shingles of a 3-word doc
    assert(row.getSeq[Long](4).size == 8)
    assert(row.getInt(6) == 2)
    assert(row.getInt(7) == 2) // 'the' counts per occurrence
    // sig_agreement over two minhash columns
    val agr = spark.sql(
      """SELECT sig_agreement(minhash_shingles(array('a','b'), 2, 8),
        |                     minhash_shingles(array('a','b'), 2, 8)) AS a""".stripMargin)
      .head().getDouble(0)
    assert(agr == 1.0)
  }
}
