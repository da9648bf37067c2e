package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are parquet under `sfDir`. The `events` table carries a
  * nanosecond-precision timestamp column, which Spark's parquet reader
  * only accepts as a raw long (`spark.sql.legacy.parquet.nanosAsLong`);
  * [[events]] exposes both the raw nanos (`ts`, long) and a derived
  * microsecond timestamp (`ts_utc`) for time arithmetic.
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` kept as raw nanos and `ts_utc` as a proper
    * timestamp (nanos truncated to micros — matches DuckDB's implicit
    * TIMESTAMP_NS → TIMESTAMP cast, which also truncates). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, sfDir, "events")
      .withColumn("ts_utc", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
  }
}
