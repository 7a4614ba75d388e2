package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated star schema (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark rejects by
    // default — read nanos as long, then truncate to a micros timestamp
    // (identical to DuckDB's ns→µs cast on these positive epochs).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(col("ts") / lit(1000L) cast LongType))
    else df
  }
}
