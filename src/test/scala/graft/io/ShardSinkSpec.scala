package graft.io

import java.nio.file.Files

import graft.TestSpark
import graft.operators.Sharding
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical shard export ([[ShardSink]]) vs its manifest
  * ([[Sharding.q102ShardManifest]]): the two derive placement from the
  * same expression, and this spec pins that the written tree actually
  * reconciles — per-shard doc counts, token sums, AND the XOR content
  * signature — so a transported shard can be verified against the
  * manifest without trusting the writer. */
class ShardSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("written shard tree reconciles with the q102 manifest, and round-trips") {
    val docs = Tables.load(spark, sf, "documents")
    val manifest = Sharding.q102ShardManifest(docs).collect()
    assert(manifest.map(_.getLong(1)).sum === docs.count())

    val out = Files.createTempDirectory("graft_shards").toString
    ShardSink.write(docs, out, filesPerShard = 1)

    // partition dirs exist and are pruned reads
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length === manifest.length)

    // read-back: per-shard counts/tokens/signature match the manifest
    val back = ShardSink.read(spark, out)
      .select(col("shard").cast("long").as("shard"),
        graft.operators.Provenance.contentHash60(
          concat_ws("|", col("doc_id"), col("text"))).as("h"),
        size(split(col("text"), " ")).as("n_toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        expr("bit_xor(h)").as("content_sig"))
      .collect().map(r => r.getLong(0) -> r).toMap
    manifest.foreach { m =>
      val b = back(m.getLong(0))
      assert(b.getLong(1) === m.getLong(1), s"n_docs shard ${m.getLong(0)}")
      assert(b.getLong(2) === m.getLong(2), s"n_tokens shard ${m.getLong(0)}")
      assert(b.getLong(3) === m.getLong(4), s"content_sig shard ${m.getLong(0)}")
    }

    // placement stability: re-keying doc_ids does not move any text
    // between shards (content-addressed, not id-addressed) — the
    // signatures differ (they hash id|text) but doc counts per shard
    // don't
    val rekeyed = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val m2 = Sharding.q102ShardManifest(rekeyed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    manifest.foreach(m => assert(m2(m.getLong(0)) === m.getLong(1)))

    // filesPerShard widens the tree without changing content
    val out2 = Files.createTempDirectory("graft_shards2").toString
    ShardSink.write(docs, out2, filesPerShard = 2)
    assert(ShardSink.read(spark, out2).count() === docs.count())
  }
}
