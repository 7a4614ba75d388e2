package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import java.util.concurrent.ConcurrentHashMap

/** Parquet table loader for the driver-generated star schema (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Sessions whose nanosAsLong conf we've already pinned. Our own mains set
  // the conf at builder time; this guards driver-provided sessions (entry())
  // without re-mutating conf on every table load.
  private val confPinned = ConcurrentHashMap.newKeySet[SparkSession]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark rejects by
    // default — read nanos as long, then truncate to a micros timestamp.
    // `ts div 1000` stays in Long (integer division, exact) — a `/` here
    // would go through Double, whose 53-bit mantissa cannot represent
    // epoch-nanos (~1.7e18) exactly and corrupts ~1.5% of values by 1 µs.
    if (confPinned.add(spark))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** events scan with a static `[startDate, endDateExclusive)` window pushed
    * down BEFORE the ns→µs conversion: the predicate lands on the raw INT64
    * nanos column (shows as PushedFilters in explain), so parquet row-group
    * stats prune the scan — a filter on the derived timestamp column could
    * not be pushed. At 100 TB this is the difference between reading a
    * 30-day slice and a full-table scan.
    */
  def eventsBetween(spark: SparkSession, sfDir: String,
                    startDateIso: String, endDateExclusiveIso: String): DataFrame = {
    if (confPinned.add(spark))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    def nanos(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.getEpochSecond * 1000000000L
    if (df.schema("ts").dataType == LongType)
      df.filter(col("ts") >= lit(nanos(startDateIso)) &&
          col("ts") < lit(nanos(endDateExclusiveIso)))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      df.filter(col("ts") >= lit(startDateIso).cast("timestamp") &&
        col("ts") < lit(endDateExclusiveIso).cast("timestamp"))
  }
}
