package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every left row, attach the single latest right row
  * with `rightTs <= leftTs` per key (the time-series enrichment join —
  * "state as of the event").
  *
  * Spark-first formulation (the preference-order (a) composition — no
  * custom plan needed): tag and UNION both sides, then one window pass
  * per key ordered by (ts, side) carries the latest right payload forward
  * with `last(_, ignoreNulls)`; left rows then hold exactly the as-of
  * match. Cost = one shuffle on the key + one in-partition sort — the
  * same exchange/sort a dedicated sort-merge as-of physical operator
  * would do, but entirely inside native window codegen.
  *
  * Right rows at ts equal to a left ts DO match (`<=`); callers must make
  * the right side unique per (key, ts) — equal-timestamp duplicates make
  * any as-of semantics ambiguous (DuckDB's ASOF has the same caveat).
  *
  * Scale notes: state carried per partition is one row of right payload
  * (the running `last`), so skewed keys cost sort time, not memory; at
  * 100 TB pre-bucket both sides by the key (Sources.writeBucketed) and
  * the exchange disappears.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val leftOut = left.columns.toSeq
    require(rightPayload.intersect(leftOut).isEmpty,
      s"right payload columns ${rightPayload.intersect(leftOut).mkString(",")} clash with left")

    val rSchema = right.schema
    def rType(c: String) = rSchema(c).dataType
    val lSchema = left.schema
    def lType(c: String) = lSchema(c).dataType

    val lTagged = left.select(
      (Seq(col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftOut.map(c => col(c).as(s"__l_$c")) ++
        rightPayload.map(c => lit(null).cast(rType(c)).as(s"__r_$c"))): _*)
    val rTagged = right.select(
      (Seq(col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftOut.map(c => lit(null).cast(lType(c)).as(s"__l_$c")) ++
        rightPayload.map(c => col(c).as(s"__r_$c"))): _*)

    // side 0 (right) sorts before side 1 (left) at equal ts → `<=` matches
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightPayload.foldLeft(lTagged.unionAll(rTagged)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftOut.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(c => col(s"__r_$c").as(c))): _*)
  }
}
