package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are parquet under `sfDir`. The `events` table's `ts`
  * column has shipped in two physical layouts across testdata
  * generations: TIMESTAMP_NS (which Spark's parquet reader only
  * accepts as a raw long via `spark.sql.legacy.parquet.nanosAsLong`)
  * and plain µs TIMESTAMP. [[load]] normalizes both to the engine's
  * internal convention — `ts` = epoch NANOS as long — so every
  * operator's integral-ns arithmetic and every DuckDB oracle
  * (`epoch_ns(ts)` / `epoch_us(ts)` work on either physical type)
  * are layout-independent. [[events]] additionally derives the
  * microsecond `ts_utc` timestamp for event-time operations.
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events frame so `ts` is epoch nanos (long) whatever
    * the physical parquet type was. µs → ns is exact (×1000); the NTZ
    * cast is µs-preserving under the session's pinned UTC zone. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type $other")
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `events` with `ts` kept as raw nanos and `ts_utc` as a proper
    * timestamp (nanos truncated to micros — matches DuckDB's implicit
    * TIMESTAMP_NS → TIMESTAMP cast, which also truncates). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integral `div`, never `/`: the long->double promotion rounds by up
    // to 128 ns at 1.7e18-magnitude timestamps (> 2^53), which can land
    // ts_utc one µs below DuckDB's exact truncation (same rule as
    // TemporalJoins/EventStream)
    load(spark, sfDir, "events")
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
  }
}
