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

  test("a killed export cannot destroy the previous good tree; read refuses a _SUCCESS-less tree") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Files.createTempDirectory("graft_shards_atomic").toString
    ShardSink.write(docs, out)
    val before = ShardSink.read(spark, out).count()
    // a kill mid-write leaves only a _tmp tree; the export at `path`
    // must be untouched
    Files.createDirectories(java.nio.file.Paths.get(out + "._tmp/shard=0"))
    assert(ShardSink.read(spark, out).count() === before)
    // a tree with no _SUCCESS (e.g. interrupted between delete and
    // rename, or hand-assembled) is refused, not silently served
    val broken = Files.createTempDirectory("graft_shards_broken").toString
    intercept[IllegalArgumentException] { ShardSink.read(spark, broken) }
  }

  test("packed export: files reconcile row-for-row with the q108 manifest; totals reconcile with q67 and q102") {
    import graft.operators.Packing
    val docs = Tables.load(spark, sf, "documents")
    val seqLen = 2048
    val manifest = Packing.q108PackedShards(docs, seqLen).collect()

    // totals ↔ q67: same token mass, same sequence count, and the
    // doc-slice total equals docs + every boundary crossing q67 plans
    val plan = Packing.q67SequencePack(docs, seqLen).collect()
    val totalToks = plan.map(_.getLong(1)).sum
    assert(manifest.map(_.getLong(3)).sum === totalToks, "token mass")
    val nSeqs = (totalToks + seqLen - 1) / seqLen
    assert(manifest.map(_.getLong(1)).sum === nSeqs, "sequence count")
    val slices = plan.map { r =>
      val start = r.getLong(2) * seqLen + r.getLong(3)
      val end = start + r.getLong(1)
      ((end - 1) / seqLen - r.getLong(2)) + 1 // sequences this doc overlaps
    }.sum
    assert(manifest.map(_.getLong(2)).sum === slices, "doc-slice total")
    // ↔ q102: every doc contributes at least one slice, none invented
    assert(Sharding.q102ShardManifest(docs).collect().map(_.getLong(1)).sum
      === plan.length.toLong)
    // zero-padding certificate: every shard is exactly full except the
    // one holding the global tail sequence
    val partial = manifest.filter(_.getDouble(5) < 1.0)
    assert(partial.length <= 1, "at most one shard may hold the tail")

    // physical tree ↔ manifest, row for row
    val out = Files.createTempDirectory("graft_packed_shards").toString
    ShardSink.writePacked(docs, out, seqLen)
    val back = ShardSink.read(spark, out)
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_doc_slices"), sum("toks").as("n_toks"),
        min("ssig").as("ssig"), max("ssig").as("ssig2"))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_seqs"), sum("n_doc_slices").as("n_doc_slices"),
        sum("n_toks").as("n_tokens"), expr("bit_xor(ssig)").as("content_sig"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(back.size === manifest.length)
    manifest.foreach { m =>
      val b = back(m.getLong(0))
      assert(b.getLong(1) === m.getLong(1), s"n_seqs shard ${m.getLong(0)}")
      assert(b.getLong(2) === m.getLong(2), s"n_doc_slices shard ${m.getLong(0)}")
      assert(b.getLong(3) === m.getLong(3), s"n_tokens shard ${m.getLong(0)}")
      assert(b.getLong(4) === m.getLong(4), s"content_sig shard ${m.getLong(0)}")
    }
    // a sequence is never torn across shards, and its written ssig is
    // one value (min ≡ max above would have failed otherwise)
    val torn = ShardSink.read(spark, out).select("seq_id", "shard").distinct()
      .groupBy("seq_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(torn === 0L, "every sequence must land whole in one shard")
  }
}
