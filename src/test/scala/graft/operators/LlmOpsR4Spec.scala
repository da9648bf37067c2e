package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 LLM-pipeline operators: decontamination (q66), global
  * sequence packing (q67), int8-quantized recall (q68), domain-mixture
  * allocation (q69), corpus manifest (q70). */
class LlmOpsR4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- q66 decontamination ----------------------------------------

  test("q66 flags only training docs, with ratios in (0, 1]") {
    val rows = Contamination.q66Decontaminate(Tables.load(spark, sf, "documents"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 7, s"benchmark doc ${r.getLong(0)} in output")
      assert(r.getLong(2) <= r.getLong(1), "hit grams exceed total grams")
      assert(r.getLong(3) >= 1)
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0, s"contamination $c out of range")
    }
  }

  test("q66 catches a planted benchmark copy and ignores clean docs") {
    import spark.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val clean = (1 to 20).map(i => s"other$i").mkString(" ")
    // doc 7 is the benchmark slice (7 % 50 == 7); doc 1 copies it, doc 2 is clean
    val docs = Seq((7L, text), (1L, text), (2L, clean)).toDF("doc_id", "text")
    val out = Contamination.q66Decontaminate(docs).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val r = out.head
    assert(r.getLong(1) === 13L) // 20 tokens -> 13 distinct 8-grams
    assert(r.getLong(2) === 13L && r.getDouble(4) === 1.0)
  }

  // ---- q67 sequence packing ---------------------------------------

  test("q67 matches a sequential driver-side pack exactly") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Packing.q67SequencePack(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // expected pack re-derives offsets sequentially from the SAME
    // learned-BPE counts — the packing logic is under test, the
    // tokenizer has its own spec (BpeSpec)
    val expected = docs
      .select(col("doc_id"),
        Bpe.tokenCount(Bpe.merges(docs), col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .foldLeft((0L, Vector.empty[(Long, Long, Long, Long, Int)])) {
        case ((start, acc), (id, n)) =>
          val spans = if ((start + n - 1) / 2048 > start / 2048) 1 else 0
          (start + n, acc :+ ((id, n, start / 2048, start % 2048, spans)))
      }._2
    assert(out.toSeq === expected)
  }

  test("q67 plan has no unpartitioned window") {
    val windows = Packing.q67SequencePack(Tables.load(spark, sf, "documents"))
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window: $w"))
  }

  // ---- q68 quantized recall ---------------------------------------

  test("q68 recall is perfect when quantization is lossless") {
    import spark.implicits._
    // entries in {-c, 0, c} quantize exactly (x/s is ±127 or 0), so the
    // quantized ranking must reproduce the float ranking: recall 1.0
    val dim = 8
    val vecs = (0 until 40).map { i =>
      val c = 0.5f
      (i.toLong, Array.tabulate(dim)(d =>
        if ((i + d) % 3 == 0) c else if ((i + d) % 3 == 1) -c else 0f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = VectorOps.q68QuantizedRecall(df, nQueries = 4, k = 3).collect()
    assert(out.length === 4)
    out.foreach(r => assert(r.getDouble(2) === 1.0, s"qid ${r.getLong(0)}"))
  }

  test("q68 recall on real embeddings is sane and deterministic") {
    val emb = Tables.load(spark, sf, "embeddings")
    val a = VectorOps.q68QuantizedRecall(emb).collect()
    val b = VectorOps.q68QuantizedRecall(emb).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // int8 on 64-dim unit-ish vectors: average recall should be high
    val mean = a.map(_.getDouble(2)).sum / a.length
    assert(mean >= 0.6, s"mean quantized recall $mean suspiciously low")
  }

  // ---- q69 domain mixture -----------------------------------------

  test("q69 caps oversized domains and keeps undersized ones whole") {
    import spark.implicits._
    // big: 10 docs x 100 tokens = 1000; tiny: 1 doc x 10 tokens.
    // budget = 0.5 * 1010 = 505; uniform target = 252.5 per lang.
    val big = (1 to 10).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "en"))
    val tiny = Seq((11L, Seq.fill(10)("w").mkString(" "), "de"))
    val docs = (big ++ tiny).toDF("doc_id", "text", "lang")
    val out = Curate.q69DomainMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("de").getDouble(3) === 1.0 && out("de").getLong(4) === 10L)
    assert(out("en").getDouble(3) === 0.2525)
    assert(out("en").getLong(4) === 252L) // floor(0.2525 * 1000)
  }

  test("q69 on testdata: rates in (0, 1], alloc bounded by inventory") {
    val rows = Curate.q69DomainMix(Tables.load(spark, sf, "documents")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getLong(4) <= r.getLong(2), "alloc exceeds inventory")
    }
  }

  // ---- q70 corpus manifest ----------------------------------------

  test("q70 manifest is row-order and partitioning invariant") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Provenance.q70Manifest(docs).collect().toSeq
    val b = Provenance.q70Manifest(
      docs.repartition(7).sortWithinPartitions(col("n_chars"))).collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(0)).distinct.size === a.size)
  }

  test("q70 flips exactly the edited row's bucket signature") {
    val docs = Tables.load(spark, sf, "documents")
    val base = Provenance.q70Manifest(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val edited = docs.withColumn("text",
      when(col("doc_id") === 5L, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val after = Provenance.q70Manifest(edited).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(base.keySet === after.keySet)
    base.keySet.foreach { bkt =>
      if (bkt == 5L % 64) {
        assert(base(bkt)._1 === after(bkt)._1, "count must not change")
        assert(base(bkt)._2 !== after(bkt)._2, "signature must flip")
      } else assert(base(bkt) === after(bkt), s"untouched bucket $bkt changed")
    }
  }
}
