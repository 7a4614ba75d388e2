package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("decomposed sequences normalize, NFC input is unchanged, codegen ≡ eval") {
    val rows = Seq(
      "Cafe\u0301",          // e + combining acute → é
      "Caf\u00e9",           // already NFC
      "A\u030a",             // A + ring → Å
      "\u1e69",              // s with dot below and dot above (already NFC)
      "ascii only", "")
    val df = rows.toDF("s")
      .select(col("s"), NfcNormalize.column(col("s")).as("n"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = rows.map(s => (s,
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    assert(got == want)
    // the decomposed forms actually changed (the test would be vacuous otherwise)
    assert(got.head._1 != got.head._2 && got(2)._1 != got(2)._2)
    // whole-stage codegen handles the expression (no fallback) — a local
    // Seq constant-folds to LocalTableScan, so drive it from range()
    val gen = spark.range(4).select(
      NfcNormalize.column(concat(lit("Café "), col("id").cast("string")))
        .as("n"))
    assert(gen.collect().forall(_.getString(0).startsWith("Caf\u00e9 ")))
    // the `*(n)` star prefix is the whole-stage-codegen marker in the
    // executedPlan string — the Project carrying nfc_normalize must be
    // inside a codegen stage, not a fallback Project
    val plan = gen.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("nfc_normalize") && l.trim.startsWith("*(")), plan)
    // null propagates
    assert(Seq((null: String)).toDF("s")
      .select(NfcNormalize.column(col("s"))).head().isNullAt(0))
    // SQL registration round trip
    org.apache.spark.sql.GraftBridge.installFunctions(spark, new GraftExtensions())
    assert(spark.sql("SELECT nfc_normalize('Cafe\u0301') AS n")
      .head().getString(0) == "Caf\u00e9")
  }
}
