package graft.expr

import org.apache.spark.sql.functions._

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

  test("GraftExtensions registers the SQL function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; used via spark.sql.extensions
  }
}
