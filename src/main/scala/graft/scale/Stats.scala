package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable exact moments — incremental statistics maintenance. A daily
  * pipeline should not rescan a year of history to refresh corpus stats:
  * per-epoch MOMENT tables (n, Σv, Σv²) are algebraic — they merge by
  * plain addition — so each day computes its own moments from its own
  * partition and the running totals fold in by key. All sums are exact
  * (long count + DECIMAL sums of integer micro-units, the q51/q44
  * discipline): merge order cannot change a bit, so incremental ≡ batch
  * exactly — q118 puts that equivalence under the hash gate the same way
  * q110 does for SCD2.
  *
  * The value column must already be an integer micro-unit long (e.g.
  * `round(value * 1e6).cast("long")`) — floats don't merge exactly.
  */
object Stats {

  /** Per-key exact moments of an integer micro-unit column:
    * (keys..., n, s1, s2). DECIMAL(38,0) sums survive ~1e12-row groups of
    * 1e10-scale products without wrapping.
    */
  def moments(df: DataFrame, keyCols: Seq[String], microCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(microCol).cast("decimal(38,0)")).as("s1"),
        sum(col(microCol).cast("decimal(19,0)") * col(microCol)).as("s2"))

  /** Fold moment tables into one: union + per-key addition. Output schema
    * matches [[moments]], so the result can be persisted and merged again
    * tomorrow.
    */
  def merge(keyCols: Seq[String], parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
  }

  /** Sample standard deviation (in original units) from micro-unit
    * moments — the q51 formula: fixed IEEE expressions over exact inputs.
    * A single-row group has no sample stddev (the n−1 denominator would
    * divide by zero), so n=1 yields a defined NULL rather than leaving
    * the result at the mercy of ANSI-mode/engine divide-by-zero behavior.
    */
  def stddevFromMoments(m: DataFrame, scale: Double = 1e6): DataFrame =
    m.withColumn("sd_value",
      when(col("n") > 1,
        round(sqrt(
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) /
            (col("n") - 1)) / scale, 6))
        .otherwise(lit(null).cast("double")))
}
