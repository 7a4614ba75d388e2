package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.3): the reference has no I/O layer —
  * its target systems are BigQuery/Parquet/CSV — so this is the engine's
  * native ingestion/export path for those formats, schema-first.
  *
  * Scale notes: always pass an explicit schema (inference is a full extra
  * scan); partition output by the natural pruning key (date) so downstream
  * backfills driven by the date-range kernels prune partitions instead of
  * scanning; JSON payload columns go through `from_json` + the record
  * operators (the README pipeline).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-first CSV (no inference scan). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Schema-first JSON-lines. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The "messy API payload" ingestion shape: a raw JSON string column
    * parsed against a declared payload schema — the entry point the
    * record-shape operators (flatten/prune/convert/move-unknown) chain
    * onto.
    */
  def parseJsonColumn(df: DataFrame, jsonCol: String, payloadSchema: StructType,
                      as: String = "payload"): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), payloadSchema))

  /** Parquet sink, optionally partitioned by pruning keys (dates). */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV export — stringify nested columns first (D8), CSV cannot hold
    * structs.
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    graft.ops.JsonStringify()(df)
      .write.mode(mode).option("header", header.toString).csv(path)

  def writeJsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Schema-first ORC — the third columnar codec (ships with Spark; no
    * extra dependency). Same contract as the parquet pair: declared
    * schema on read, no inference scan.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed parquet table: rows hash-partitioned into `numBuckets` by
    * `bucketCols` at WRITE time (and sorted within buckets), so repeated
    * joins/aggregations on those keys read co-located data and skip the
    * shuffle entirely — the 100 TB answer for fact tables joined on the
    * same key every day. Bucketed tables require the catalog
    * (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) prepareOverwrite(df.sparkSession, table)
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Plain (non-bucketed) managed parquet table with the same
    * overwrite-safety as [[writeBucketed]] — for small catalog tables
    * like stored centroid matrices where bucketing buys nothing.
    */
  def saveTable(df: DataFrame, table: String,
                mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) prepareOverwrite(df.sparkSession, table)
    df.write.mode(mode).format("parquet").saveAsTable(table)
  }

  /** Before/after observability for [[compactTable]] — the numbers a
    * maintenance dashboard alerts on (row delta = torn-append duplicates
    * removed; file delta = small-files debt repaid).
    */
  final case class CompactStats(table: String, rowsBefore: Long, filesBefore: Int,
                                rowsAfter: Long, filesAfter: Int)

  /** Compact a bucketed managed table after many [[SaveMode.Append]]
    * increments: one bucketed rewrite that (a) repays the small-files
    * debt — every append adds `numBuckets` files per table, and after N
    * appends each bucket is N+1 files that every probe must open — and
    * (b) drops the duplicate rows a torn append leaves behind (the
    * documented crash artifact of the keys-LAST / units-LAST recovery
    * orderings: re-appended signature/bucket rows that cost duplicate
    * candidate work but cannot change results). `distinct()` is the
    * canonicalization: every index table's rows are value-keyed (no
    * ordering, no versioning), so duplicates are exact row copies.
    *
    * CRASH-SAFE by temp-table swap: the compacted copy lands complete in
    * `<table>__compact` while the live table still serves probes; only
    * then DROP + RENAME swap it in. A crash before the DROP changes
    * nothing (the rewrite restarts); a crash in the swap window (live
    * dropped, rename pending) is auto-recovered on rerun — the complete
    * compacted copy is renamed into place before anything else happens.
    * Probes concurrent with the swap window fail-loud (table missing),
    * never read-partial.
    */
  def compactTable(spark: SparkSession, table: String, bucketCols: Seq[String],
                   numBuckets: Int): CompactStats = {
    val tmp = s"${table}__compact"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      // torn-swap recovery: the previous run wrote the full compacted
      // copy and dropped the live table but died before the rename
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    }
    val before = spark.table(table)
    val (rowsBefore, filesBefore) = (before.count(), before.inputFiles.length)
    // repartition on the bucket columns with numBuckets partitions:
    // HashPartitioning and the bucket-id function are the same
    // Murmur3-pmod, so every task holds exactly one bucket's rows and
    // the rewrite lands ONE file per bucket — without this, each write
    // task emits a file per bucket it touches and the rewrite wouldn't
    // actually repay the small-files debt it exists to repay
    writeBucketed(
      before.distinct().repartition(numBuckets, bucketCols.map(c => before(c)): _*),
      tmp, bucketCols, numBuckets)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    val after = spark.table(table)
    CompactStats(table, rowsBefore, filesBefore, after.count(), after.inputFiles.length)
  }

  /** The compaction POLICY that turns [[compactTable]] from a manual move
    * into a maintenance loop: compact only when the small-files debt has
    * actually accumulated — more than `maxFilesPerBucket` files per bucket
    * on average (each append adds up to `numBuckets` files, so the
    * threshold is "roughly `maxFilesPerBucket` uncompacted appends").
    * Returns None when the table is within budget, so a daily ingest job
    * can call this unconditionally after its append and pay the rewrite
    * only once per N days — the metadata check is one catalog listing, no
    * data read. Debt-triggered, not clock-triggered, so an idle index is
    * never rewritten and a hot one is compacted as often as it needs.
    */
  def compactIfNeeded(spark: SparkSession, table: String, bucketCols: Seq[String],
                      numBuckets: Int,
                      maxFilesPerBucket: Int = 4): Option[CompactStats] = {
    val tmp = s"${table}__compact"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      // same torn-swap recovery as compactTable: finish the pending rename
      // before deciding anything from the (otherwise missing) live table
      spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    }
    // "call unconditionally" includes before the first append ever created
    // the table (empty first batch) — a missing table is a policy no-op,
    // not an error
    if (!spark.catalog.tableExists(table)) return None
    val files = spark.table(table).inputFiles.length
    if (files > maxFilesPerBucket.toLong * numBuckets)
      Some(compactTable(spark, table, bucketCols, numBuckets))
    else None
  }

  /** Schema-drift boundary: read several EPOCHS of a dataset whose schema
    * evolved over time (columns added, columns dropped, integer/float
    * widths widened) against one DECLARED schema — the table-level analog
    * of the record operators' drift handling (`move_unknown_keys_to_extra`
    * for unexpected fields, `convert_dict_types` for type coercion;
    * reference `data_structures.py`). Per epoch:
    *
    *  - a column missing from the epoch materializes as typed NULL,
    *  - an exact type match passes through,
    *  - a LOSSLESS widening (int→long, float→double …, `Cast.canUpCast`)
    *    is cast in place,
    *  - anything lossy FAILS LOUD naming the column and both types — a
    *    silent narrow/reinterpret is how a 100 TB backfill corrupts
    *    quietly.
    *
    * Epochs are reconciled independently then `unionByName`d, so no
    * cross-epoch footer merge pass runs (mergeSchema reads every file's
    * footer up front AND refuses width changes); driver cost is one
    * schema read per epoch, bounded by the epoch count. Matching is
    * case-insensitive like the rest of Spark's resolution.
    */
  def readEvolved(spark: SparkSession, paths: Seq[String],
                  expected: StructType): DataFrame = {
    require(paths.nonEmpty, "readEvolved needs at least one epoch path")
    import org.apache.spark.sql.catalyst.expressions.Cast
    paths.map { p =>
      val df = spark.read.parquet(p)
      df.select(expected.fields.toIndexedSeq.map { f =>
        df.schema.fields.find(_.name.equalsIgnoreCase(f.name)) match {
          case None =>
            lit(null).cast(f.dataType).as(f.name)
          case Some(g) if g.dataType == f.dataType =>
            col(g.name).as(f.name)
          case Some(g) if Cast.canUpCast(g.dataType, f.dataType) =>
            col(g.name).cast(f.dataType).as(f.name)
          case Some(g) =>
            throw new IllegalArgumentException(
              s"readEvolved: column `${f.name}` in $p has ${g.dataType.sql}, " +
                s"which cannot losslessly evolve to declared ${f.dataType.sql}")
        }
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Range-sorted export: the corpus globally ORDERED by `keyCol` across
    * `numFiles` parquet files — file i holds a contiguous, disjoint key
    * range below file i+1's. `repartitionByRange` picks the boundaries by
    * SAMPLING (one lightweight pass, never a global sort — the planner's
    * RangePartitioning exchange), and `sortWithinPartitions` makes each
    * task write its file in key order, so parquet row-group min/max stats
    * are tight and a downstream range predicate prunes to the one file
    * (and row group) that can hold it. The 100 TB shape for
    * merge-joinable / binary-searchable exports: no stage ever holds a
    * total order, only per-file orders plus disjoint boundaries.
    * Explicit `numFiles` keeps AQE from coalescing the range exchange.
    */
  def writeRangeSorted(df: DataFrame, path: String, keyCol: String,
                       numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Per-file manifest of a [[writeRangeSorted]] export: (file, min_key,
    * max_key, n, sum_key), one row per parquet file via the `_metadata`
    * column — a metadata-shaped aggregation, one scan of the key column
    * only. Downstream planners use it for file-level skipping; q111 uses
    * it to hash-gate the disjointness contract.
    */
  def rangeManifest(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col(keyCol), col("_metadata.file_path").as("__file"))
      .groupBy(col("__file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n"), sum(col(keyCol)).as("sum_key"))

  private def prepareOverwrite(spark: SparkSession, table: String): Unit = {
    if (spark.catalog.tableExists(table)) {
      // The catalog knows the table's REAL location (custom LOCATION,
      // non-default database, whatever) and DROP on a managed table
      // deletes its data there — no path reconstruction needed.
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
    } else if (!table.contains('.')) {
      // Orphaned-directory recovery: an in-memory catalog dies with its
      // JVM but the warehouse files survive, and CREATE then refuses
      // the leftover location. Only the default-database layout can be
      // reconstructed here (warehouse/<table-lowercase>); the path is
      // decoded via java.net.URI, never string surgery, and only local
      // file:// locations are touched.
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = scala.util.Try {
        val u = java.net.URI.create(wh)
        if (u.getScheme == null) wh
        else if (u.getScheme == "file") u.getPath
        else null
      }.getOrElse(wh.stripPrefix("file:"))
      if (whPath != null) {
        val loc = new java.io.File(whPath, table.toLowerCase)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          rm(loc)
        }
      }
    }
  }
}
