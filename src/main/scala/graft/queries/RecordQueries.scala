package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ConvertType, ConvertTypes, DateFieldRule, Flatten, NormalizeDateFields, Prune}

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
    }),

    // D4 convert_dict_types: the API-payload shape — everything arrives as
    // strings, a schema casts it back. Exercises the "3.14"→int-via-float
    // path, bool vocabulary, lenient NULL fallback, date parse, and the
    // unix-timestamp→ISO family.
    "q9_convert_types" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          // corrupt every 7th row to exercise the lenient fallback
          when(col("o_orderkey") % 7 === 0, lit("n/a"))
            .otherwise(col("o_totalprice").cast("string")).as("qty_str"),
          when(col("o_orderstatus") === "F", lit("true")).otherwise(lit("no")).as("flag_str"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"),
          (col("o_orderkey") * 100000 + 1700000000L).cast("string").as("epoch_str"))
        .transform(ConvertTypes(Map(
          "qty_str" -> ConvertType.ToInt,
          "flag_str" -> ConvertType.ToBool,
          "date_str" -> ConvertType.ToDate,
          "epoch_str" -> ConvertType.TsToIso))(_))
        .select(
          col("o_orderkey"),
          col("qty_str").as("qty"),
          col("flag_str").as("flag"),
          col("date_str").as("d"),
          col("epoch_str").as("created_iso"))
    }),

    // D7 normalize_date_fields: suffix rule renames `*_at` epoch fields to
    // `datetime_*` ISO strings, nested struct handled recursively.
    "q10_normalize_dates" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          col("ts").cast("long").as("created_at"),
          struct(
            (col("ts").cast("long") + 86400L).as("updated_at"),
            col("event_type").as("kind")).as("meta"))
        .transform(NormalizeDateFields(
          rules = Seq(DateFieldRule(
            suffix = Seq("_at"), convert = ConvertType.TsToIso, target = "datetime")),
          recursive = true)(_))
        .select(
          col("event_id"),
          col("datetime_created"),
          col("meta.datetime_updated").as("datetime_updated"),
          col("meta.kind").as("kind"))
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
        |  FROM customer)""".stripMargin,

    // Independent reimplementation of the conversion matrix: int-via-float
    // truncates toward zero (DuckDB CAST rounds — use trunc), bool
    // vocabulary {'true','1','yes','on'}, lenient failures → NULL,
    // epoch→ISO rendered in UTC.
    "q9_convert_types" ->
      """SELECT o_orderkey,
        |  CASE WHEN regexp_matches(src.qty_str, '^-?[0-9]+(\.[0-9]+)?$')
        |       THEN CAST(trunc(CAST(src.qty_str AS DOUBLE)) AS BIGINT)
        |       ELSE NULL END AS qty,
        |  lower(src.flag_str) IN ('true', '1', 'yes', 'on') AS flag,
        |  try_cast(src.date_str AS DATE) AS d,
        |  strftime(to_timestamp(CAST(src.epoch_str AS BIGINT)),
        |           '%Y-%m-%dT%H:%M:%S') AS created_iso
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'n/a'
        |         ELSE CAST(o_totalprice AS VARCHAR) END AS qty_str,
        |    CASE WHEN o_orderstatus = 'F' THEN 'true' ELSE 'no' END AS flag_str,
        |    strftime(o_orderdate, '%Y-%m-%d') AS date_str,
        |    CAST(o_orderkey * 100000 + 1700000000 AS VARCHAR) AS epoch_str
        |  FROM orders) src""".stripMargin,

    "q10_normalize_dates" ->
      """SELECT event_id,
        |  strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)),
        |           '%Y-%m-%dT%H:%M:%S') AS datetime_created,
        |  strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) + 86400),
        |           '%Y-%m-%dT%H:%M:%S') AS datetime_updated,
        |  event_type AS kind
        |FROM events""".stripMargin)
}
