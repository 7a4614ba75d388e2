package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mergeable approximate sketches: lossless HLL union, bit-exact
  * histogram merging, and the deterministic quantile interpolation.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    (1L to 400L).map(i => (s"k${i % 2}", (i % 97) * 3.7, i % 113))

  test("hll union of epoch partials equals the single-pass sketch estimate") {
    val df = rows.toDF("k", "v", "u")
    val parts = Seq(df.filter($"u" % 3 === 0), df.filter($"u" % 3 === 1),
      df.filter($"u" % 3 === 2))
    val merged = Sketches.hllEstimate(
      Sketches.hllMerge(Seq("k"), parts.map(Sketches.hllSketch(_, Seq("k"), "u")): _*),
      Seq("k"), "est").orderBy("k").collect().toSeq
    val batch = Sketches.hllEstimate(
      Sketches.hllSketch(df, Seq("k"), "u"), Seq("k"), "est")
      .orderBy("k").collect().toSeq
    assert(merged == batch)
    // small cardinalities sit in the sketch's exact sparse mode
    val exact = df.groupBy("k").agg(count_distinct($"u").as("est"))
      .orderBy("k").collect().toSeq
    assert(batch == exact)
  }

  test("across the sparse→dense promotion, union agrees with batch within 1%") {
    // big enough that partials promote out of the sketch's exact sparse
    // mode — union and single-pass may round apart, but only slightly
    val df = (1L to 20000L).map(i => ("k", i)).toDF("k", "u")
    val parts = Seq(df.filter($"u" % 2 === 0), df.filter($"u" % 2 === 1))
    val m = Sketches.hllEstimate(
      Sketches.hllMerge(Seq("k"), parts.map(Sketches.hllSketch(_, Seq("k"), "u")): _*),
      Seq("k"), "est").head().getLong(1)
    val b = Sketches.hllEstimate(
      Sketches.hllSketch(df, Seq("k"), "u"), Seq("k"), "est").head().getLong(1)
    assert(math.abs(m - b) <= math.max(1L, b / 100), s"merged=$m batch=$b")
    assert(math.abs(m - 20000L) <= 1000L && math.abs(b - 20000L) <= 1000L,
      s"merged=$m batch=$b vs exact 20000")
  }

  test("histogram counts merge bit-exactly under any split") {
    val df = rows.toDF("k", "v", "u")
    val parts = Seq(df.filter($"u" % 4 <= 1), df.filter($"u" % 4 === 2),
      df.filter($"u" % 4 === 3))
    def sk(d: org.apache.spark.sql.DataFrame) =
      Sketches.histSketch(d, Seq("k"), "v", 0.0, 8.0, 64)
    val merged = Sketches.histMerge(Seq("k"), parts.map(sk): _*)
      .orderBy("k", "bin").collect().toSeq
    assert(merged == sk(df).orderBy("k", "bin").collect().toSeq)
  }

  test("out-of-domain values clamp to the edge bins, totals stay exact") {
    val df = Seq(("a", -5.0), ("a", 1.0), ("a", 999.0)).toDF("k", "v")
    val sk = Sketches.histSketch(df, Seq("k"), "v", 0.0, 1.0, 10)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(sk == Seq((0L, 1L), (1L, 1L), (9L, 1L)))
  }

  test("quantile interpolation: known bins, pinned formula") {
    // one key, bins 0..3 with counts 2,2,4,2 (total 10), step 10, lo 0:
    // p50 target 5 → bin 2 (cumBefore 4): (2 + (5-4)/4)*10 = 22.5
    // p90 target 9 → bin 3 (cumBefore 8): (3 + (9-8)/2)*10 = 35.0
    val vals = Seq.fill(2)(5.0) ++ Seq.fill(2)(15.0) ++
      Seq.fill(4)(25.0) ++ Seq.fill(2)(35.0)
    val sk = Sketches.histSketch(vals.map(("a", _)).toDF("k", "v"),
      Seq("k"), "v", 0.0, 10.0, 16)
    val out = Sketches.histQuantiles(sk, Seq("k"),
      Seq("p50" -> 0.5, "p90" -> 0.9), 0.0, 10.0).head()
    assert(out.getDouble(1) == 22.5 && out.getDouble(2) == 35.0, out)
  }

  test("estimates from merged partials track the true quantiles within a bin") {
    val df = rows.toDF("k", "v", "u")
    val est = Sketches.histQuantiles(
      Sketches.histSketch(df, Seq("k"), "v", 0.0, 2.0, 256),
      Seq("k"), Seq("p50" -> 0.5), 0.0, 2.0)
    val truth = df.groupBy("k").agg(expr("percentile(v, 0.5)").as("t"))
    val joined = est.join(truth, "k").collect()
    joined.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 2.0 + 1e-9, r)
    }
  }
}
