package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

import graft.Tables
import graft.ops.{AsOfJoin, CleanColumns, ConvertType, ConvertTypes, DateFieldRule, Flatten,
  JsonStringify, MoveUnknown, NormalizeDateFields, Prune, Walk}

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
          // rendered as a JSON string so the oracle compare can sort/hash
          // rows (raw arrays are unhashable in the driver's pandas sort);
          // NULL (array emptied by pruning) stays NULL through to_json.
          to_json(col("tags")).as("tags"))
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
    }),

    // D5 clean_dict: SHA-256 scrub with a suffix allowlist skip rule and
    // global string truncation.
    "q11_clean_pii" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_name"),
          concat(lit("user"), col("c_custkey"),
            when(col("c_nationkey") % 5 === 0, lit("@corp.com"))
              .otherwise(lit("@ext.io"))).as("email"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("note"))
        .transform(CleanColumns(
          keysToClean = Seq("c_name", "email"),
          mode = CleanColumns.Hash,
          skipRules = Map("email" -> Seq(CleanColumns.Suffix("@corp.com"))),
          truncateStrings = Some(20))(_))
    }),

    // D3 move_unknown_keys_to_extra: stable-schema whitelist; extras
    // collected (sorted) and exported through D8 to_json.
    "q12_move_unknown" -> ((s, dir) => {
      Tables(s, dir, "part")
        .transform(MoveUnknown(
          allowedKeys = Seq("p_partkey", "p_name", "p_retailprice", "p_missing"),
          fillMissing = true)(_))
        .transform(JsonStringify(keys = Some(Seq("extra_collected")))(_))
    }),

    // D8 convert_to_json_string: type-dispatched stringification.
    "q13_json_stringify" -> ((s, dir) => {
      Tables(s, dir, "supplier")
        .select(
          col("s_suppkey"),
          struct(col("s_name"), col("s_nationkey")).as("obj"),
          array(col("s_name"), col("s_nationkey").cast("string")).as("arr"),
          (col("s_acctbal") > 0).as("flag"),
          col("s_acctbal").as("num"))
        .transform(JsonStringify()(_))
    }),

    // The SURVEY §7.2 end-to-end slice: messy API payload → columnar
    // monthly rollup, chaining parse → flatten (D6) → type conversion (D4)
    // → date-field normalization (D7) → aggregate. One scan, one shuffle.
    "q30_pipeline" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          col("ts").cast("long").as("created_at"),
          col("event_type"),
          col("value").cast("string").as("value_str"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("props"))
        .transform(Flatten()(_))
        .transform(ConvertTypes(Map("value_str" -> ConvertType.ToFloat))(_))
        .transform(NormalizeDateFields(Seq(DateFieldRule(
          suffix = Seq("_at"), convert = ConvertType.TsToIsoDate, target = "date")))(_))
        .groupBy(substring(col("date_created"), 1, 7).as("month"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("value_str")), 2).as("sum_value"),
          count_distinct(col("props__k")).as("distinct_k"))
    }),

    // As-of join: every event enriched with the customer's latest order at
    // event time (one shuffle on the key; checked against DuckDB's native
    // ASOF JOIN). Right side deduped to one order per (custkey, date) —
    // equal-timestamp duplicates make as-of semantics ambiguous.
    "q31_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val events = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val orders = Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"), col("o_orderdate").as("odate"),
          col("o_orderkey").as("last_order"), col("o_totalprice").as("last_price"))
      AsOfJoin.asofJoin(events, orders, "user_id", "ts", "odate")
        .select(col("event_id"), col("user_id"), col("last_order"),
          round(col("last_price"), 2).as("last_price"))
    }),

    // D2 walk: ASCII tree of a summary record. Driver-side by design (the
    // reference renders one record for humans); the 5-row dim collect is
    // the debug-utility exception, not a pattern.
    // Table-level data-quality gate (ops.Validate) — the ingestion-
    // boundary complement of the record-local strict conversions: seven
    // declared expectations over orders evaluate as conditional
    // aggregates in ONE scan, unpivoted into the (rule, violations,
    // max_violations, passed) report. One rule (the tight price range) is
    // deliberately FAILING so the report's red path is itself under the
    // hash gate — its exact violation count is restated by the oracle, so
    // both a broken metric and a silently-green gate are hash-red.
    "q117_data_quality" -> ((s, dir) => {
      import graft.ops.Validate
      import graft.ops.Validate._
      Validate.report(Tables(s, dir, "orders"), Seq(
        notNull("o_orderkey"),
        unique("o_orderkey"),
        inRange("o_totalprice", 0.0, 1000000.0),
        inRange("o_totalprice", 0.0, 100000.0),
        acceptedValues("o_orderstatus", Seq("O", "F", "P")),
        matches("o_orderpriority", "^[1-5]-"),
        minRows(1000L)))
    }),

    "q14_walk_render" -> ((s, dir) => {
      import s.implicits._
      val names = Tables(s, dir, "region")
        .select(col("r_name")).collect().map(_.getString(0)).toSeq.sorted
      val item = ListMap[String, Any]("regions" -> names, "total" -> names.size)
      Walk(showTypes = true, showLengths = true).lines(item)
        .zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("line_no", "line")
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
        |  CASE WHEN len(l) = 0 THEN NULL ELSE to_json(l) END AS tags
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
        |FROM events""".stripMargin,

    // Cleaning semantics reimplemented: hash = sha256 of utf-8 bytes; the
    // @corp.com suffix skip keeps originals; every string (hashes included,
    // 64 hex > 20) truncates to 20 chars + '… truncated (etl)'.
    "q11_clean_pii" ->
      """WITH src AS (
        |  SELECT c_custkey, c_name,
        |    'user' || CAST(c_custkey AS VARCHAR) ||
        |      (CASE WHEN c_nationkey % 5 = 0 THEN '@corp.com' ELSE '@ext.io' END) AS email,
        |    c_mktsegment || '-' || c_name AS note
        |  FROM customer),
        |trunc_fn AS (SELECT 20 AS lim)
        |SELECT c_custkey,
        |  CASE WHEN length(sha256(c_name)) > 20
        |       THEN substr(sha256(c_name), 1, 20) || '… truncated (etl)'
        |       ELSE sha256(c_name) END AS c_name,
        |  CASE WHEN email LIKE '%@corp.com'
        |       THEN CASE WHEN length(email) > 20
        |                 THEN substr(email, 1, 20) || '… truncated (etl)'
        |                 ELSE email END
        |       ELSE CASE WHEN length(sha256(email)) > 20
        |                 THEN substr(sha256(email), 1, 20) || '… truncated (etl)'
        |                 ELSE sha256(email) END END AS email,
        |  CASE WHEN length(note) > 20
        |       THEN substr(note, 1, 20) || '… truncated (etl)'
        |       ELSE note END AS note
        |FROM src""".stripMargin,

    "q12_move_unknown" ->
      """SELECT p_name, CAST(NULL AS VARCHAR) AS p_missing, p_partkey, p_retailprice,
        |  to_json(struct_pack(p_brand := p_brand, p_size := p_size,
        |                      p_type := p_type)) AS extra_collected
        |FROM part""".stripMargin,

    "q13_json_stringify" ->
      """SELECT CAST(s_suppkey AS VARCHAR) AS s_suppkey,
        |  to_json(struct_pack(s_name := s_name, s_nationkey := s_nationkey)) AS obj,
        |  to_json([s_name, CAST(s_nationkey AS VARCHAR)]) AS arr,
        |  CASE WHEN s_acctbal > 0 THEN 'true' ELSE 'false' END AS flag,
        |  CAST(s_acctbal AS VARCHAR) AS num
        |FROM supplier""".stripMargin,

    "q31_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS user_id, o_orderdate AS odate,
        |    o_orderkey AS last_order, o_totalprice AS last_price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn
        |        FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o.last_order,
        |  round(o.last_price, 2) AS last_price
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.ts >= o.odate""".stripMargin,

    "q30_pipeline" ->
      """SELECT substr(strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)),
        |              '%Y-%m-%d'), 1, 7) AS month,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value,
        |  count(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS distinct_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Every rule's violation count restated independently; passed is
    // derived the same way on both sides.
    "q117_data_quality" ->
      """WITH m AS (
        |  SELECT
        |    CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS v_nn,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_uq,
        |    CAST(count(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                      OR o_totalprice > 1000000 THEN 1 END) AS BIGINT) AS v_r1,
        |    CAST(count(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                      OR o_totalprice > 100000 THEN 1 END) AS BIGINT) AS v_r2,
        |    CAST(count(CASE WHEN o_orderstatus IS NULL
        |                      OR o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS BIGINT) AS v_av,
        |    CAST(count(CASE WHEN o_orderpriority IS NULL
        |                      OR NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END) AS BIGINT) AS v_rx,
        |    CAST(greatest(0, 1000 - count(*)) AS BIGINT) AS v_mr
        |  FROM orders),
        |r AS (
        |  SELECT 'not_null(o_orderkey)' AS rule, v_nn AS violations, CAST(0 AS BIGINT) AS max_violations FROM m
        |  UNION ALL SELECT 'unique(o_orderkey)', v_uq, 0 FROM m
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,1000000.0)', v_r1, 0 FROM m
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,100000.0)', v_r2, 0 FROM m
        |  UNION ALL SELECT 'accepted_values(o_orderstatus)', v_av, 0 FROM m
        |  UNION ALL SELECT 'matches(o_orderpriority)', v_rx, 0 FROM m
        |  UNION ALL SELECT 'min_rows(1000)', v_mr, 0 FROM m)
        |SELECT rule, violations, max_violations,
        |  violations <= max_violations AS passed
        |FROM r""".stripMargin,

    // The tree lines recomputed from the region table itself.
    "q14_walk_render" ->
      """WITH r AS (SELECT r_name, row_number() OVER (ORDER BY r_name) AS rn,
        |                  count(*) OVER () AS n FROM region)
        |SELECT CAST(0 AS BIGINT) AS line_no, '[dict len=2]' AS line
        |UNION ALL
        |SELECT 1, '├─ regions [list len=' || CAST((SELECT count(*) FROM region) AS VARCHAR) || ']'
        |UNION ALL
        |SELECT 1 + rn,
        |  (CASE WHEN rn = n THEN '│  └─ ' ELSE '│  ├─ ' END)
        |  || '[' || CAST(rn - 1 AS VARCHAR) || ']: ' || r_name || ' (str)'
        |FROM r
        |UNION ALL
        |SELECT (SELECT count(*) + 2 FROM region),
        |  '└─ total: ' || CAST((SELECT count(*) FROM region) AS VARCHAR) || ' (int)'""".stripMargin)
}
