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

  test("q91 v3: rows 1-6 equal v2, chaining holds, stages 7/8 reconcile") {
    val rep3 = CurateV2.q91CurationV3(docs, emb).collect()
    assert(rep3.length == 9)
    assert(rep3.map(_.getString(1)).toSeq == Seq("pii_scrub",
      "quality_lm_gate", "exact_dedup", "near_dedup_lsh", "emb_dedup_ivf",
      "decontaminate", "fuzzy_decontam", "boilerplate_gate", "pack"))
    // the shared labeled frame: v3's first six stages ARE v2's
    (0 until 6).foreach { i =>
      assert(rep3(i).toSeq.take(6) == report(i).toSeq.take(6),
        s"v3 stage ${i + 1} diverged from v2")
    }
    rep3.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(4))
    }
    // stages 7/8 reconcile with the standalone operators run on the
    // stage-6 survivor set (recomputed independently, v2-spec style)
    val flagMicro = math.round(LmScore.DefaultFlagBits * 1e6)
    val base = LangQuality.withLangQuality(
        docs.filter(pmod(col("doc_id"), lit(50L)) =!= 7)
          .select(col("doc_id"), col("source"),
            PiiScrub.scrub(PiiScrub.augmented).as("text")))
      .select("doc_id", "source", "text", "quality")
    val flagged = LmScore.perDocBits(base.select("doc_id", "source", "text"))
      .filter(col("mb") > col("nbg") * lit(flagMicro)).select("doc_id")
    val s2 = base.filter(col("quality") >= 0.4)
      .join(flagged, Seq("doc_id"), "left_anti").select("doc_id", "text")
    val keepers = TextOps.q21ExactDedup(s2).select(col("keeper").as("doc_id"))
    val s3 = s2.join(keepers, Seq("doc_id"), "left_semi")
    val s4 = s3.join(Fuzzy.q27LshDedup(s3).select(col("idb").as("doc_id"))
      .distinct(), Seq("doc_id"), "left_anti")
    val p54 = VectorOps.q54BucketedEmbDedup(emb)
    val sIds = s4.select("doc_id")
    val losers5 = p54
      .join(sIds.withColumnRenamed("doc_id", "ida"), Seq("ida"), "left_semi")
      .join(sIds.withColumnRenamed("doc_id", "idb"), Seq("idb"), "left_semi")
      .select(col("idb").as("doc_id")).distinct()
    val s5 = s4.join(losers5, Seq("doc_id"), "left_anti")
    val benchGrams = Contamination.grams(
      docs.filter(pmod(col("doc_id"), lit(50L)) === 7), 8).select("h").distinct()
    val dirty = Contamination.grams(s5, 8)
      .join(benchGrams, Seq("h"), "left_semi").select("doc_id").distinct()
    val s6 = s5.join(dirty, Seq("doc_id"), "left_anti").cache()
    // stage 7 standalone: q27 machinery over s6 ∪ raw bench, cross-side
    val bench = docs.filter(pmod(col("doc_id"), lit(50L)) === 7)
      .select("doc_id", "text")
    val isB = (c: org.apache.spark.sql.Column) => pmod(c, lit(50L)) === 7
    val losers7 = Fuzzy.q27LshDedup(s6.union(bench), 0.5)
      .filter(isB(col("ida")) =!= isB(col("idb")))
      .select(when(isB(col("ida")), col("idb")).otherwise(col("ida"))
        .as("doc_id")).distinct()
    val s7 = s6.join(losers7, Seq("doc_id"), "left_anti").cache()
    // stage 8 standalone: q86 coverage within s7
    val losers8 = SubstringDedup.coverage(s7)
      .filter(col("dup_frac") > 0.5).select("doc_id")
    val s8 = s7.join(losers8, Seq("doc_id"), "left_anti")
    assert(rep3(6).getLong(4) == s7.count(), "stage 7 n_out mismatch")
    assert(rep3(7).getLong(4) == s8.count(), "stage 8 n_out mismatch")
    Seq(s6, s7).foreach(_.unpersist())
  }

  test("q95 v4: rows 1-7 equal v3; trim reclaims tokens instead of dropping docs") {
    val rep3 = CurateV2.q91CurationV3(docs, emb).collect()
    val rep4 = CurateV2.q95CurationV4(docs, emb).collect()
    assert(rep4.length == 9)
    assert(rep4(7).getString(1) == "boilerplate_trim")
    // the shared stage-1–7 frame: v4's first seven rows ARE v3's
    (0 until 7).foreach { i =>
      assert(rep4(i).toSeq.take(6) == rep3(i).toSeq.take(6),
        s"v4 stage ${i + 1} diverged from v3")
    }
    rep4.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(4), "n_in must chain from n_out")
    }
    val (n7, t7) = (rep4(6).getLong(4), rep4(6).getLong(5))
    val (dr8, n8, t8) = (rep4(7).getLong(3), rep4(7).getLong(4), rep4(7).getLong(5))
    // trim drops only fully-boilerplate docs — every one of those has
    // coverage 1.0 > 0.5, so v4 can never drop more docs than v3's gate
    assert(dr8 <= rep3(7).getLong(3), "trim dropped more docs than the drop gate")
    assert(n8 == n7 - dr8)
    // trimmed token base: never more than the untrimmed survivors'
    assert(t8 <= t7)
    // v4 keeps at least v3's surviving DOC count (its drops are a
    // subset); token totals are not comparable — v4 also trims
    // boilerplate out of docs v3 kept whole
    assert(n8 >= rep3(7).getLong(4), "v4 must keep at least v3's survivors")
  }

  test("q95 planted fixture: template-dominated docs are trimmed, not dropped; accounting reconciles") {
    import spark.implicits._
    // 6 docs sharing a 9-token header + unique tails, plus enough clean
    // docs to keep quality gates quiet is unnecessary — operate the
    // stage-8 kernel directly through the strip API at pipeline params
    val header = "this document is provided as is without any warranty"
    val tails = (1L to 6L).map(i => s"unique$i tail$i words$i here$i")
    val docsF = ((1L to 6L).map(i =>
        (i, s"$header ${tails(i.toInt - 1)}")) :+
      (7L, "a completely different document with nothing shared at all"))
      .toDF("doc_id", "text")
    val stripped = SubstringDedup.strip(docsF,
      SubstringDedup.winnerHashes(docsF, SubstringDedup.DefaultK, 20))
    val out = stripped.collect().map(r =>
      r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // every templated doc keeps its unique remainder; none is emptied
    (1L to 6L).foreach { i =>
      assert(out(i)._1 > 0, s"doc $i must lose boilerplate tokens")
      assert(out(i)._2.endsWith(tails(i.toInt - 1)), s"doc $i remainder lost")
    }
    assert(out(7L)._1 == 0L, "unique doc untouched")
  }

  test("q91 planted fixtures: block-shuffled bench leak drops at stage 7, " +
       "template-dominated doc at stage 8") {
    import spark.implicits._
    // (a) fuzzy leaks: every bench doc gets a 7-token-block-rotated copy
    // planted at a train residue. Rotation preserves most trigram
    // shingles (J well above 0.5) but caps the longest verbatim run at
    // 7 tokens, so stage 6's 8-gram check CANNOT catch it — only the
    // fuzzy stage can. Ids ≡ 1 mod 50: never bench, never PII-injected.
    val benchRows = docs.filter(pmod(col("doc_id"), lit(50L)) === 7)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    def rotate(text: String): String = {
      val t = text.split(" ")
      val blocks = t.grouped(7).toSeq
      (blocks.drop(1) :+ blocks.head).flatten.mkString(" ")
    }
    val leaks = benchRows.zipWithIndex.map { case (r, i) =>
      (1000001L + 50L * i, rotate(r.getString(1)), r.getString(2),
        r.getString(3), r.getLong(4))
    }.toSeq
    // (b) one template-dominated doc: two 9-token spans copied from two
    // DIFFERENT real train docs + a 6-token tail remixed from the same
    // donors (real vocabulary — no unseen bigram storm to trip the LM
    // gate; runs of 3 cannot form an 8-gram). Coverage 18/24 > 0.5;
    // pairwise Jaccard vs either donor stays under the 0.2 LSH
    // threshold, so it survives near-dedup and must die at stage 8.
    val donors = docs.filter(pmod(col("doc_id"), lit(50L)) === 2)
      .filter(size(split(col("text"), " ")) >= 40)
      .orderBy("doc_id").limit(2)
      .select("text").collect().map(_.getString(0).split(" "))
    assert(donors.length == 2, "need two long donor docs for the fixture")
    val span1 = donors(0).slice(10, 19).mkString(" ")
    val span2 = donors(1).slice(10, 19).mkString(" ")
    val tail = (donors(0).slice(25, 28) ++ donors(1).slice(25, 28)).mkString(" ")
    val tmplId = 2000001L
    val tmpl = (tmplId, s"$span1 $span2 $tail", "en", "web", 0L)
    val planted = docs.unionByName(
      (leaks :+ tmpl).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rep = CurateV2.q91CurationV3(planted, emb).collect()
    assert(rep(6).getLong(3) >= 1,
      s"no fuzzy-leak drop at stage 7: ${rep.mkString("; ")}")
    assert(rep(7).getLong(3) >= 1,
      s"no boilerplate drop at stage 8: ${rep.mkString("; ")}")
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

  test("q105 attribution reconciles with q91's stage totals and the corpus census") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val att = CurateV2.q105DropAttribution(docs, emb).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rep = CurateV2.q91CurationV3(docs, emb).collect()
    // per-stage attribution sums == q91's n_dropped column, stage by stage
    (2 to 8).foreach { k =>
      val a = att.collect { case ((_, s), n) if s == k => n }.sum
      assert(a === rep(k - 1).getLong(3), s"stage $k attribution != q91 n_dropped")
    }
    // survivors (drop_stage 0) == q91's final n_out
    assert(att.collect { case ((_, 0), n) => n }.sum === rep(8).getLong(4))
    // every train-side doc is attributed exactly once
    val trainN = docs.filter("doc_id % 50 != 7").count()
    assert(att.values.sum === trainN)
  }
}
