package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import java.util.concurrent.ConcurrentHashMap

/** Parquet table loader for the driver-generated star schema (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  *
  * Ingestion normalization contract: `events.ts` has shipped in three
  * physical parquet encodings across testdata generations — INT64
  * TIMESTAMP(NANOS), TIMESTAMP_MICROS(isAdjustedToUTC=0) (Spark:
  * TIMESTAMP_NTZ), and TIMESTAMP_MICROS(isAdjustedToUTC=1) (Spark:
  * TIMESTAMP). The loader owns accepting every physical encoding and
  * emitting ONE logical type (`TimestampType`, UTC session), the way the
  * reference's `to_date` accepts the whole DateLike union and emits one
  * date (etlutil/date.py:27-37) — consumers never branch on layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Sessions whose confs we've already pinned. Our own mains set these at
  // builder time; this guards driver-provided sessions (entry()) without
  // re-mutating conf on every table load.
  private val confPinned = ConcurrentHashMap.newKeySet[SparkSession]()

  private[graft] def pinConf(spark: SparkSession): Unit =
    if (confPinned.add(spark)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The NTZ→TIMESTAMP normalization below is wall-clock-preserving only
      // under a UTC session timezone; pin it here so an external session
      // with a different zone cannot silently shift values.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }

  /** Normalize any physical encoding of `ts` to `TimestampType`.
    *   - INT64 nanos-as-long: `ts div 1000` stays in Long (integer
    *     division, exact) — a `/` would go through Double, whose 53-bit
    *     mantissa cannot represent epoch-nanos (~1.7e18) exactly and
    *     corrupts ~1.5% of values by 1 µs.
    *   - TIMESTAMP_NTZ: cast to TimestampType. Session TZ is pinned UTC, so
    *     the wall-clock value is unchanged and every DuckDB oracle (which
    *     reads the same parquet as naive timestamps) stays hash-identical.
    *   - TimestampType: already the target.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TIMESTAMP cast is wall-clock-preserving ONLY under a UTC
        // session TZ. pinConf pins it once per session, but external code
        // can reset the conf afterwards — re-check at cast time and fail
        // LOUD instead of silently shifting every value by the zone offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if (tz != "UTC")
          throw new IllegalStateException(
            s"events.ts normalization needs spark.sql.session.timeZone=UTC " +
              s"but the session now has '$tz' — the NTZ cast would shift " +
              "wall-clock values; restore UTC before loading events")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        // fail LOUD on a layout this boundary has never seen — a silent
        // pass-through is exactly the round-8 drift class this function
        // exists to close (every known encoding is matched above; a new
        // one needs an explicit branch plus a TablesSpec case)
        throw new IllegalStateException(
          s"events.ts read as unsupported type $other — the testdata layout " +
            "changed; extend Tables.normalizeTs (and TablesSpec) for it")
    }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    pinConf(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
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
    pinConf(spark)
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    def nanos(iso: String): Long =
      java.time.LocalDate.parse(iso).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.getEpochSecond * 1000000000L
    df.schema("ts").dataType match {
      case LongType =>
        df.filter(col("ts") >= lit(nanos(startDateIso)) &&
            col("ts") < lit(nanos(endDateExclusiveIso)))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Predicate on the raw NTZ column against NTZ literals, BEFORE the
        // cast to TimestampType — a TIMESTAMP literal would make coercion
        // cast the column side and the filter would no longer reach
        // PushedFilters (silent full scan).
        normalizeTs(
          df.filter(col("ts") >= lit(startDateIso).cast(TimestampNTZType) &&
            col("ts") < lit(endDateExclusiveIso).cast(TimestampNTZType)))
      case _ =>
        df.filter(col("ts") >= lit(startDateIso).cast("timestamp") &&
          col("ts") < lit(endDateExclusiveIso).cast("timestamp"))
    }
  }
}
