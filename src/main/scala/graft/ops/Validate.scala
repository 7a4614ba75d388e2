package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the ingestion gate a 100 TB pipeline runs
  * before a batch is allowed downstream (the Deequ/dbt-test pattern). The
  * reference's quality surface is record-local (`convert_dict_types`
  * strict mode rejects one value at a time, `data_structures.py`); this
  * is the TABLE-level complement: declared expectations, one report row
  * each, evaluated in ONE scan.
  *
  * Every expectation reduces to an integer VIOLATION COUNT (the q44
  * lesson: no float metrics — a fraction threshold becomes an absolute
  * count upstream). All counts evaluate as conditional aggregates in a
  * single `agg(...)` pass — N expectations cost one scan, not N — and the
  * one-row result unpivots into the (rule, violations, max_violations,
  * passed) report. `unique` rides the same pass as a distinct-count
  * aggregate (Spark plans the distinct expansion inside the same
  * aggregation, no second scan of the source).
  */
object Validate {

  /** One declared expectation: `violations` must be an AGGREGATE column
    * producing a non-negative count; the rule passes when
    * `violations <= maxViolations`.
    */
  final case class Expectation(rule: String, violations: Column,
                               maxViolations: Long = 0L)

  def notNull(c: String): Expectation =
    Expectation(s"not_null($c)", count(when(col(c).isNull, 1)))

  def unique(cols: String*): Expectation =
    Expectation(s"unique(${cols.mkString(",")})",
      count(lit(1)) - count_distinct(col(cols.head), cols.tail.map(col): _*))

  def inRange(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"in_range($c,$lo,$hi)",
      count(when(col(c).isNull || col(c) < lo || col(c) > hi, 1)))

  def acceptedValues(c: String, values: Seq[String]): Expectation =
    Expectation(s"accepted_values($c)",
      count(when(col(c).isNull || !col(c).isin(values.map(lit): _*), 1)))

  def matches(c: String, regex: String): Expectation =
    Expectation(s"matches($c)",
      count(when(col(c).isNull || !col(c).rlike(regex), 1)))

  def minRows(n: Long): Expectation =
    Expectation(s"min_rows($n)", greatest(lit(0L), lit(n) - count(lit(1))))

  /** Evaluate all expectations in one scan and return the report:
    * (rule STRING, violations BIGINT, max_violations BIGINT,
    * passed BOOLEAN), one row per expectation, in declaration order.
    */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations declared")
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      e.violations.cast("long").as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate into the report (stack is plan-time —
    // the scan already happened; this is driver-free reshaping)
    val n = expectations.size
    val cells = expectations.zipWithIndex.map { case (e, i) =>
      // rule names are code-authored literals; escape defensively anyway —
      // backslashes FIRST (or the quote escape's own backslash doubles)
      val name = e.rule.replace("\\", "\\\\").replace("'", "\\'")
      s"'$name', __v$i, CAST(${e.maxViolations} AS BIGINT)"
    }.mkString(", ")
    one.selectExpr(
        s"stack($n, $cells) AS (rule, violations, max_violations)")
      .withColumn("passed", col("violations") <= col("max_violations"))
  }

  /** Gate form: throw if any expectation fails — the "stop the pipeline"
    * call a daily batch job makes right after landing.
    */
  def enforce(df: DataFrame, expectations: Seq[Expectation]): Unit = {
    val failed = report(df, expectations)
      .filter(!col("passed"))
      .select(col("rule"), col("violations"))
      .collect() // bounded: one row per declared expectation
    if (failed.nonEmpty) {
      val detail = failed.map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", ")
      throw new IllegalStateException(s"data-quality gate failed: $detail")
    }
  }
}
