package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-family modules; every entry has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (those get the driver's weaker rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracle),
      (DateQueries.queries, DateQueries.oracle),
      (RecordQueries.queries, RecordQueries.oracle),
      (ScaleQueries.queries, ScaleQueries.oracle),
      (SourceQueries.queries, SourceQueries.oracle),
      (StreamQueries.queries, StreamQueries.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 end-to-end slice: parse → flatten → convert →
    * normalize-dates → aggregate in one declarative plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q30_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
