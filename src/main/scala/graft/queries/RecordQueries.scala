package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Flatten, Prune}

/** Record-shape operators (SURVEY.md §2.1) as distributed queries over the
  * driver tables, each with an independent DuckDB oracle.
  *
  * The reference transforms one nested record at a time; here each operator
  * is a `DataFrame => DataFrame` transform whose schema recursion runs once
  * on the driver and compiles to a single select list — per-row cost is
  * pure Tungsten expression evaluation, no shuffles are introduced, and
  * column pruning still reaches the parquet scans through the aliases.
  */
object RecordQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D6 flatten_dict: parse the events JSON payload, build a two-level
    // nested struct, flatten to BQ-safe `__` columns, then aggregate on a
    // flattened key — the README's "messy payload → columnar" pipeline.
    "q7_flatten_props" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("props",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .withColumn("payload",
          struct(col("event_type"),
            struct(col("user_id"), col("value")).as("meta")))
        .select(col("event_id"), col("props"), col("payload"))
        .transform(Flatten()(_))
        .groupBy(col("props__k"), col("payload__event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("payload__meta__value")), 2).as("sum_value"),
          count_distinct(col("payload__meta__user_id")).as("users"))
    }),

    // D1 prune_data: nested key removal (static schema drop), array element
    // removal by value + emptiness (runtime `filter`), over customer.
    "q8_prune_nested" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .withColumn("profile",
          struct(col("c_name"), col("c_nationkey"),
            struct(col("c_acctbal"), col("c_mktsegment")).as("fin")))
        .withColumn("tags",
          array(col("c_mktsegment"), lit(""), upper(substring(col("c_name"), 1, 2))))
        .select(col("c_custkey"), col("profile"), col("tags"))
        .transform(Prune.byNames(
          keysToRemove = Seq("c_nationkey", "c_mktsegment"),
          valuesToRemove = Seq("CU", "BUILDING"),
          removeEmpty = true)(_))
        .select(
          col("c_custkey"),
          col("profile.c_name").as("name"),
          col("profile.fin.c_acctbal").as("acctbal"),
          col("tags"))
    }))

  def oracle: Map[String, String] = Map(
    "q7_flatten_props" ->
      """SELECT CAST(json_extract(props, '$.k') AS INT) AS props__k,
        |  event_type AS payload__event_type,
        |  count(*) AS cnt,
        |  round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    // Independent reformulation: c_nationkey/c_mktsegment pruned by KEY from
    // the structs (array elements are values, not keys — they stay unless
    // value-matched), '' dropped as empty, 'CU'/'BUILDING' dropped as values.
    // An array emptied by pruning loses its KEY in the reference — the
    // columnar equivalent is NULL, not [].
    "q8_prune_nested" ->
      """SELECT c_custkey, name, acctbal,
        |  CASE WHEN len(l) = 0 THEN NULL ELSE l END AS tags
        |FROM (
        |  SELECT c_custkey, c_name AS name, c_acctbal AS acctbal,
        |    list_filter(
        |      [c_mktsegment, '', upper(substr(c_name, 1, 2))],
        |      x -> NOT (x = '' OR x = 'CU' OR x = 'BUILDING')) AS l
        |  FROM customer)""".stripMargin)
}
