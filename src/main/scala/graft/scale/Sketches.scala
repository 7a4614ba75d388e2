package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable APPROXIMATE sketches — the probabilistic complement of
  * [[Stats]]' exact moments, and what a 100 TB pipeline actually stores
  * per epoch: a distinct-count partial (HLL) and a value-distribution
  * partial (fixed-bin histogram), each a tiny table that folds into the
  * running state without rescanning history.
  *
  *  - **HLL partials** ride Spark's built-in DataSketches HLL aggregates
  *    (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *    Dense-mode registers merge by max, so the union never loses
  *    information — but a union whose inputs straddle the sketch's
  *    sparse→dense promotion can ROUND differently than the single-pass
  *    sketch of the same set (measured: identical at 150 distinct/key,
  *    ~0.3% apart at 1,500 — the sparse side is exact, the promoted side
  *    estimates). The honest invariant q124 pins is therefore
  *    agreement within 1% between merged-partials and batch, plus both
  *    landing within the sketch's design error of the exact count — not
  *    bit equality across a mode boundary.
  *  - **Histogram sketches** are deliberately the simplest mergeable
  *    quantile summary: equi-width bin counts over a DECLARED domain
  *    (out-of-domain values clamp to the edge bins). Counts are integers,
  *    so merging is plain per-bin addition — exact, associative, order-
  *    free — and the quantile estimate is a fixed IEEE interpolation over
  *    those integers, which a DuckDB oracle can restate term by term (the
  *    q51/q118 discipline, impossible for an opaque KLL/t-digest blob).
  *    Accuracy is bounded by the bin width, the honest trade for exact
  *    mergeability.
  *
  * Both sketch tables persist as ordinary parquet and merge by key, so
  * tomorrow's epoch folds in with one keyed shuffle of sketch-sized (not
  * data-sized) rows.
  */
object Sketches {

  // ---------------------------------------------------------------- HLL

  /** Per-key HLL sketch of `valueCol`'s distinct values:
    * (keys..., hll BINARY). Default lgK (12) ⇒ ~1.6 KB per key at full
    * density, ~2% relative error at scale; small key groups stay in the
    * sketch's exact sparse mode.
    */
  def hllSketch(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))

  /** Fold HLL sketch tables into one per key — register-wise max, so the
    * merge is lossless, commutative, and associative.
    */
  def hllMerge(keyCols: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))
  }

  /** Finish a sketch table into per-key estimates: (keys..., users_est). */
  def hllEstimate(sketch: DataFrame, keyCols: Seq[String],
                  as: String = "distinct_est"): DataFrame =
    sketch.select((keyCols.map(col) :+
      hll_sketch_estimate(col("hll")).as(as)): _*)

  // ---------------------------------------------------------- histogram

  /** Per-key equi-width bin counts of `valueCol` over `[lo, lo+nBins·step)`:
    * (keys..., bin BIGINT, cnt BIGINT). Values outside the domain clamp
    * to the first/last bin — never dropped, so totals stay exact over the
    * NON-NULL values. NULL values are EXCLUDED explicitly: a NULL has no
    * position on the value axis, and without the filter the clamp
    * arithmetic would silently land it in bin 0 (`floor(NULL/step)` is
    * NULL, `greatest(NULL, 0)` skips the NULL → 0), skewing low
    * quantiles. Callers that must account for NULLs should count them
    * separately; the oracle-side twin of this filter is
    * [[histFilterSql]].
    */
  def histSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
                 lo: Double, step: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && step > 0, s"need nBins/step > 0, got $nBins/$step")
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(step)).cast("long"), lit(0L)),
      lit(nBins - 1L)).as("bin")
    df.filter(col(valueCol).isNotNull)
      .groupBy((keyCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold histogram tables into one: union + per-(key, bin) integer
    * addition — bit-exact under any split or order, same as
    * [[Stats.merge]].
    */
  def histMerge(keyCols: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_.unionByName(_))
      .groupBy((keyCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-key quantile estimates from a histogram sketch. For each
    * requested (name → q): target = q·total; the estimate interpolates
    * inside the first bin whose cumulative count reaches the target:
    *
    * {{{ round((bin + (target − cumBefore)/cnt) · step + lo, 6) }}}
    *
    * Every operation is a fixed IEEE expression over exact integer
    * inputs in a pinned order, so an independent SQL restatement of the
    * same formula matches bit for bit. One window over sketch-sized
    * rows (nBins per key), never over data.
    */
  def histQuantiles(sketch: DataFrame, keyCols: Seq[String],
                    qs: Seq[(String, Double)], lo: Double,
                    step: Double): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
    val c = sketch
      .withColumn("cum", sum(col("cnt")).over(byKey.orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt")).over(byKey))
    val aggs = qs.map { case (name, q) =>
      val target = lit(q) * col("total")
      val est = round(
        (col("bin") + (target - (col("cum") - col("cnt"))) / col("cnt")) *
          lit(step) + lit(lo), 6)
      // first qualifying bin = min of (bin, est) structs over the rows
      // at-or-past the target; cnt > 0 by construction (only non-empty
      // bins have rows)
      min(when(col("cum") >= target, struct(col("bin").as("b"), est.as("e"))))
        .getField("e").as(name)
    }
    c.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The DuckDB restatement of [[histSketch]] + [[histQuantiles]] for one
    * quantile — emitted from the SAME constants so the oracle can never
    * drift from the engine (the ZOrder.interleaveSql pattern): a scalar
    * subexpression over a CTE exposing (bin, cnt, cum, total).
    */
  def histQuantileSql(q: Double, lo: Double, step: Double): String =
    s"round((bin + ($q*total - (cum - cnt))/cnt) * $step + $lo, 6)"

  /** Oracle twin of the bin expression. Pair with [[histFilterSql]] in the
    * restatement's WHERE clause — [[histSketch]] excludes NULL values, and
    * an unfiltered oracle would bucket them into bin 0.
    */
  def histBinSql(valueExpr: String, lo: Double, step: Double, nBins: Int): String =
    s"least(greatest(CAST(floor(($valueExpr - $lo)/$step) AS BIGINT), 0), ${nBins - 1})"

  /** The NULL-exclusion predicate [[histSketch]] applies, as SQL — emitted
    * here so the oracle's WHERE clause can never drift from the engine's
    * filter.
    */
  def histFilterSql(valueExpr: String): String = s"$valueExpr IS NOT NULL"
}
