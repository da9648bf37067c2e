package graft.multimodal

import graft.TestSpark
import graft.io.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema contracts, determinism, partition
  * preservation, feature shape, and payload pruning. The decode itself
  * is the documented stub — these tests pin the Spark side that stays
  * when a real codec replaces it. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val withContent = Multimodal.withPayload(docs)
  private lazy val decoded = Multimodal.decodeMeta(withContent)

  test("payload + metadata schema contract") {
    assert(withContent.schema("content").dataType.typeName === "binary")
    val meta = decoded.schema("meta").dataType
    assert(meta === Multimodal.MediaMetaType)
    assert(decoded.count() === docs.count())
  }

  test("stub decode is deterministic and content-derived") {
    val a = decoded.select("doc_id", "meta").collect().sortBy(_.getLong(0))
    val b = Multimodal.decodeMeta(withContent)
      .select("doc_id", "meta").collect().sortBy(_.getLong(0))
    assert(a.map(_.toString) === b.map(_.toString))
    // n_bytes must equal the true payload size (not stubbed)
    val r = decoded.selectExpr("length(content)", "meta.n_bytes").head()
    assert(r.getInt(0).toLong === r.getLong(1))
  }

  test("decode preserves partitioning (no shuffle)") {
    val before = withContent.rdd.getNumPartitions
    assert(decoded.rdd.getNumPartitions === before)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("features: fixed 16-dim simplex vector") {
    val rows = Multimodal.byteHistogramFeatures(withContent)
      .select("doc_id", "features").collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length === 16)
      assert(math.abs(f.sum - 1.0) < 1e-9, s"doc ${r.getLong(0)} not normalized")
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("frame sampling: every-30th index, bounded by n_frames") {
    val rows = Multimodal.sampleFrames(decoded)
      .filter("meta.kind = 'video'")
      .select("meta.n_frames", "sampled_frames").collect()
    assert(rows.nonEmpty, "stub should yield some video rows")
    rows.foreach { r =>
      val n = r.getInt(0)
      val s = r.getSeq[Int](1)
      assert(s.head === 0 && s.last <= n - 1)
      assert(s.zip(s.tail).forall { case (a, b) => b - a === 30 })
    }
  }

  test("resize: meta rewritten to target dims, payload scaled by pixel ratio") {
    val resized = Multimodal.resize(decoded, targetW = 64, targetH = 32)
    assert(resized.schema === decoded.schema, "resize must preserve the schema contract")
    val rows = resized
      .select("doc_id", "meta.width", "meta.height", "meta.n_bytes", "content").collect()
    val orig = decoded
      .select("doc_id", "meta.width", "meta.height", "content").collect()
      .map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      assert(r.getInt(1) === 64 && r.getInt(2) === 32)
      val o = orig(r.getLong(0))
      val ratio = (64L * 32).toDouble / (o.getInt(1).toLong * o.getInt(2))
      val expectLen = math.max((o.getAs[Array[Byte]](3).length * ratio).toInt, 1)
      assert(r.getLong(3) === expectLen.toLong)
      assert(r.getAs[Array[Byte]](4).length === expectLen)
    }
    // deterministic: same input → same bytes
    val again = Multimodal.resize(decoded, 64, 32)
      .select("doc_id", "content").collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getAs[Array[Byte]](4).toSeq))
  }

  test("metadata summary partitions rows by kind") {
    val rows = Multimodal.metaSummary(decoded).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val kinds = rows.map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video", "unknown")))
  }

  test("metadata-only analytics over persisted decode never read payload bytes") {
    // the realistic pipeline: decode once, persist, analyze many times —
    // the analytic scan must prune `content` (the ~all-the-bytes column)
    // down to the meta struct
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").resolve("d").toString
    decoded.write.mode("overwrite").parquet(dir)
    val summary = Multimodal.metaSummary(spark.read.parquet(dir))
    summary.collect()
    val scan = summary.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema"), scan)
    assert(!scan.contains("content"),
      "metadata pass must not read the binary payload column:\n" + scan)
  }
}
