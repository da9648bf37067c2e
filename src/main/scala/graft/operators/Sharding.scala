package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export planning — the LAST-MILE operator of a data
  * pipeline: after curation, the corpus leaves the engine as a fixed
  * set of shards a training job streams. Placement here is
  * CONTENT-ADDRESSED (shard = 60-bit text hash mod nShards, not
  * doc_id ranges), which buys three properties doc-id sharding lacks:
  *  - stability: re-ingesting the same text under new ids lands it in
  *    the same shard, so shard-level diffs (q75) stay meaningful
  *    across snapshots;
  *  - balance without a sort: hash placement is uniform in
  *    expectation, so no range-boundary computation (a full sort or
  *    sampled range partitioner) ever runs;
  *  - exact-dup adjacency: identical texts collide into one shard,
  *    where any residual dedup is shard-local.
  *
  * q102 emits the manifest a deployment records next to the written
  * shards: per shard, doc/token/byte totals, the q70-style XOR content
  * signature (so a shard can be verified after transport WITHOUT
  * re-reading its source), and the load factor vs the uniform ideal —
  * the number an operator alerts on before a skewed shard slows every
  * epoch of a 1000-GPU read. The physical write is
  * [[graft.io.ShardSink]] (same placement expression, pinned by
  * ShardSinkSpec to reconcile with this manifest row for row).
  *
  * Scale shape: one narrow map pass (hashes + counts; text never
  * shuffles) into a `nShards`-row partial aggregate, plus the
  * broadcast-of-one-total-row cross join (the q47/q69 convention) for
  * the load factor. O(corpus) map work, O(nShards) everything else. */
object Sharding {

  val DefaultShards = 16

  def shardOf(nShards: Int) =
    pmod(Provenance.contentHash60(col("text")), lit(nShards.toLong))

  def q102ShardManifest(documents: DataFrame,
                        nShards: Int = DefaultShards): DataFrame = {
    val per = documents
      .select(shardOf(nShards).as("shard"),
        Provenance.contentHash60(concat_ws("|", col("doc_id"), col("text"))).as("h"),
        size(split(col("text"), " ")).as("n_toks"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("n_chars").as("sum_chars"), expr("bit_xor(h)").as("content_sig"))
    val tot = per.agg(sum("n_docs").as("total"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("sum_chars"),
        col("content_sig"),
        round(col("n_docs") * lit(nShards.toLong) / col("total"), 6).as("load_factor"))
      .orderBy("shard")
  }

  def q102Sql(nShards: Int = DefaultShards): String =
    s"""WITH s AS (SELECT
       |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % $nShards AS shard,
       |    CAST(concat('0x', substr(md5(concat_ws('|', doc_id, text)), 1, 15))
       |      AS BIGINT) AS h,
       |    len(regexp_split_to_array(text, ' ')) AS n_toks, n_chars
       |  FROM documents),
       |p AS (SELECT shard, count(*) AS n_docs,
       |        CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |        bit_xor(h) AS content_sig
       |      FROM s GROUP BY shard),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM p)
       |SELECT shard, n_docs, n_tokens, sum_chars, content_sig,
       |  round(n_docs * $nShards / CAST(total AS double), 6) AS load_factor
       |FROM p, t ORDER BY shard""".stripMargin
}
