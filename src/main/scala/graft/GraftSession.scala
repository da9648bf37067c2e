package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * - ANSI mode OFF: the reference's parse semantics are pandas
  *   `errors="coerce"` (malformed string → null), which matches Spark's
  *   legacy (non-ANSI) cast. See SURVEY.md §2.2 O5 (reference:
  *   crypto_etl_pipeline.py:159-187). Library code additionally guards
  *   casts with regex checks so it stays correct under ANSI sessions too.
  * - AQE ON: runtime coalescing/skew-join handling is the 100 TB posture.
  * - shuffle.partitions defaults to the local core count, not 200 — at
  *   cluster scale this is expected to be overridden (or left to AQE).
  */
object GraftSession {
  def local(cpus: Int = 32, shufflePartitions: Int = 32,
            appName: String = "graft",
            withGraftExtensions: Boolean = false): SparkSession = {
    val builder0 = SparkSession.builder()
    // Programmatic injection: the spark.sql.extensions config is static
    // (read at SparkContext creation) and silently no-ops on an
    // existing context; withExtensions always applies.
    val builder =
      if (withGraftExtensions)
        builder0.withExtensions(new graft.catalyst.GraftExtensions)
      else builder0
    val spark = builder
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
