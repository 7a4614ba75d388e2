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
