package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Physical shard writer — the sink behind
  * [[graft.operators.Sharding.q102ShardManifest]]: lays the corpus out
  * as `path/shard=S/part-*.parquet` using the SAME content-addressed
  * placement expression as the manifest, so manifest and files can
  * never disagree (ShardSinkSpec pins the reconciliation row for row).
  *
  * File-count control: `filesPerShard` sets the repartition key width —
  * (shard, doc-hash mod filesPerShard) — so each shard directory holds
  * ~filesPerShard parquet files. At sf0.001 one file per shard is
  * right; at 100 TB / 1024 shards you'd raise filesPerShard until
  * files land near the HDFS/S3 sweet spot (128 MB–1 GB), keeping
  * writer parallelism at nShards × filesPerShard tasks rather than one
  * giant file per shard (single-writer bottleneck) or
  * shuffle-partition-many tiny files (the q-compaction pathology).
  * Readers prune by the `shard=` partition directory — a training job
  * reading shard 7 lists exactly one directory.
  *
  * The write is `_SUCCESS`-gated by Spark's commit protocol like every
  * ArtifactStore artifact: a killed export leaves no readable shard
  * tree. */
object ShardSink {

  def write(documents: DataFrame, path: String,
            nShards: Int = Sharding.DefaultShards,
            filesPerShard: Int = 1): Unit =
    documents
      .withColumn("shard", Sharding.shardOf(nShards))
      .repartition(nShards * filesPerShard, col("shard"),
        pmod(graft.operators.Provenance.contentHash60(col("text")),
          lit(filesPerShard.toLong)))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Read back the shard tree (shard recovered from the directory
    * name; schema otherwise identical to the written frame). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
