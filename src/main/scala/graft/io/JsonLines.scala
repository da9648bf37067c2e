package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source — the other ubiquitous training-corpus interchange
  * format next to parquet/CSV. One JSON object per line makes the
  * format SPLITTABLE: a 100 TB corpus reads as parallel line-delimited
  * ranges with no cross-record state, unlike a multi-line JSON array
  * (which Spark must treat as one record per file).
  *
  * Read contract mirrors the engine's CSV posture (declared schema, no
  * inference pass over 100 TB) plus explicit bad-record capture: a
  * malformed line lands in `_corrupt_record` with every data column
  * null instead of failing the job or silently vanishing — a corpus
  * ingest wants to COUNT its garbage (the reference's S6 error-guard
  * semantics, extended to per-record granularity).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read with a declared schema; malformed lines are captured in
    * [[CorruptCol]] (PERMISSIVE — the ingest-pipeline default). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Streaming read of a JSONL drop directory — same declared-schema +
    * corrupt-capture contract as [[read]], as a file-source stream:
    * files landing in `path` are discovered per micro-batch, each read
    * once (exactly-once with checkpointing), lines split in parallel.
    * This is the engine's own wire format as a live ingest edge. */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a permissive read into (clean rows without the corrupt
    * column, corrupt raw lines). Spark requires caching the parsed
    * frame before filtering on the corrupt column alone — the raw
    * record is not reconstructible from a pruned scan. */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull).select(CorruptCol)
    (clean, bad)
  }

  /** Write as JSONL (one object per line, splittable downstream). */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").json(path)
  }
}
