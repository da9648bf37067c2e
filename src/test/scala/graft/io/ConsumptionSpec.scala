package graft.io

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{Bpe, Packing, Provenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The consumption ledger (q138, [[ArtifactStore.ConsumptionStore]]):
  * jobs record which export revisions they streamed; membership is
  * harvested per revision and survives the export's revision deletes;
  * a takedown re-pack changes FUTURE consumption rows but never
  * rewrites history; the takedown audit names exactly the jobs that
  * trained on a retracted doc. sf0.01. */
class ConsumptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def docs = Tables.load(spark, sf, "documents")
  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)))

  private def m = pmod(col("doc_id"), lit(Provenance.BatchMod))

  test("ledger audit ≡ live q138; history immutable across the takedown re-pack; record is idempotent") {
    val root = Files.createTempDirectory("graft_consume").toString
    val live = rows(Packing.q138ConsumptionAudit(docs))
    assert(live.map(_(0)) === Seq("job1", "job2"))
    assert(live(0)(4).asInstanceOf[Long] > 0,
      "job1 must have trained on later-retracted docs")
    assert(live(1)(4).asInstanceOf[Long] === 0L,
      "job2 consumed post-takedown revisions only")

    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "ex")
    ex.bootstrap(docs.filter(m.between(1, 9)), ms)
    ex.appendDocsAt(2, docs.filter(m === 0), ms)
    val cs = ArtifactStore.consumption(spark, root, "ex")
    // relaxed fill/mix so the LIVENESS certificate is the deciding gate
    // (fill/mix holds are ExportStoreSpec's subject)
    def certify(tombs: DataFrame) = ex.certify(
      docs.select("doc_id", "source"), tombs,
      minFillMicro = 0L, mixTolMicros = 1000000L)
    val noTombs = docs.select("doc_id").limit(0)

    cs.record("job1", ex, certify(noTombs))
    val job1Rows = rows(cs.jobs().filter(col("job_id") === "job1")
      .orderBy("tick"))
    assert(job1Rows.forall(r => r(3) == "tick" && r(5) == "serve" &&
      r(6).asInstanceOf[Long] != 0L),
      "job rows carry the serving dir kind, the stamped decision, and " +
        "the certificate signature")

    // the takedown: re-pack both epochs without the retracted docs
    val retracted = docs.filter((m.between(1, 9) || m === 0) &&
        pmod(col("doc_id"), lit(Provenance.RetractMod)) ===
          Provenance.RetractRem)
      .select("doc_id")

    // the GATE pin (r12 item 4): before the re-pack both epochs still
    // carry retracted docs — certify says hold_takedown, and record
    // REFUSES before any write (the ledger can never reference an
    // uncleared epoch)
    val held = intercept[IllegalArgumentException] {
      cs.record("jobX", ex, certify(retracted))
    }
    assert(held.getMessage.contains("hold_takedown"))
    // ... and an uncertified epoch refuses too (stale cert missing the
    // serving revision of an epoch)
    val stale = intercept[IllegalArgumentException] {
      cs.record("jobY", ex, certify(noTombs).filter(col("tick") === 1))
    }
    assert(stale.getMessage.contains("no certificate"))
    assert(cs.jobs().select("job_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("job1"),
      "refused records leave no ledger rows")

    assert(ex.retractDocs(retracted) === Seq(1L, 2L))
    cs.record("job2", ex, certify(retracted))

    assert(rows(cs.audit(retracted)) === live,
      "the ledger audit must equal the live q138 report")

    // history: job1's rows still name the PRE-takedown revisions, and
    // their membership survives although the export deleted those revs
    assert(rows(cs.jobs().filter(col("job_id") === "job1")
      .orderBy("tick")) === job1Rows,
      "a takedown must never rewrite a past job's consumption rows")
    assert(cs.jobs().filter(col("job_id") === "job2")
      .join(cs.jobs().filter(col("job_id") === "job1")
        .select("tick", "rev"), Seq("tick", "rev"), "left_semi")
      .isEmpty,
      "job2 consumed strictly newer revisions of both epochs")
    val audited = cs.trainedOn(retracted)
    assert(audited.select("job_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("job1"),
      "the takedown audit names job1 and only job1")
    assert(audited.count() === retracted.count(),
      "every retracted doc traces to the run that consumed it")

    // idempotent replay: re-recording a job overwrites, never duplicates
    cs.record("job2", ex, certify(retracted))
    assert(rows(cs.audit(retracted)) === live)

    // ledger scale hygiene (r12 item 7) + atomic job commit (r13
    // What's-wrong #1): member reads resolve through the revisioned
    // manifest record() maintains, and the JOB TABLE lives inline in
    // the same revision — job rows and dir index commit together
    val mV = new org.apache.hadoop.fs.Path(
      s"$root/consumption/ex/manifest_v")
    val fsys = mV.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsys.exists(mV), "record maintains the revisioned manifest")
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(
      s"$root/consumption/ex/jobs")),
      "new records write no job dirs — the job table is the manifest")

    // CRASH WINDOW, new order: a crashed record that committed member
    // dirs but not the manifest revision leaves NO job row anywhere —
    // an uncommitted manifest rev is invisible behind its _SUCCESS
    val before = rows(cs.audit(retracted))
    val staleRev = new org.apache.hadoop.fs.Path(
      s"$root/consumption/ex/manifest_v/rev=99")
    fsys.mkdirs(staleRev)
    assert(rows(cs.audit(retracted)) === before,
      "an uncommitted manifest revision must be invisible")
    // ... and gc() is its shedding point (the export-store rule): the
    // crash leftover goes, the serving manifest and every member dir
    // stay, the audit is untouched
    cs.gc()
    assert(!fsys.exists(staleRev),
      "gc must shed the crashed record's uncommitted manifest revision")
    assert(rows(cs.audit(retracted)) === before,
      "gc must not disturb the serving manifest or membership")

    // CRASH WINDOW, old order (a PRE-UPGRADE ledger): a fully-committed
    // legacy job dir the stale manifest never named — the exact r13
    // defect. jobs() heals it by always re-listing the cheap jobs/
    // side; its pre-certificate rows read with sentinel values, so
    // audit() marks it uncertified instead of failing or lying.
    import spark.implicits._
    Seq(("job0", 1L, 1L)).toDF("job_id", "tick", "rev")
      .coalesce(1).write
      .parquet(s"$root/consumption/ex/jobs/job=job0")
    assert(rows(cs.jobs().filter(col("job_id") === "job0")) ===
      Seq(Seq("job0", 1L, 1L, "tick", 0L, "unrecorded", 0L)),
      "legacy job rows surface with sentinel certificate columns and " +
        "the 'tick' dir-kind sentinel (pre-kind records consumed tick " +
        "dirs by construction)")
    val a0 = cs.audit(retracted).filter(col("job_id") === "job0")
      .select("certified").collect()
    assert(a0.map(_.getBoolean(0)).toSeq === Seq(false),
      "a pre-certificate job can never read as certified")
    assert(cs.trainedOn(retracted).filter(col("job_id") === "job0")
      .count() > 0,
      "the healed job row joins membership — trainedOn stays complete")
    assert(rows(cs.audit(retracted).filter(col("job_id") =!= "job0"))
      === live, "healing a legacy row must not disturb recorded jobs")

    // replaying record over a legacy job supersedes the legacy dir
    // (inline rows win; no duplicates)
    cs.record("job0", ex, certify(retracted))
    val j0 = cs.jobs().filter(col("job_id") === "job0")
    assert(j0.count() === j0.select("tick", "rev").distinct().count(),
      "a replayed record over a legacy job must not duplicate rows")
    assert(j0.filter(col("decision") === "unrecorded").isEmpty,
      "inline rows supersede the legacy dir's sentinel rows")

    // pre-manifest MEMBER fallback: with no manifest at all, members()
    // re-lists — identical membership (last: this destroys the job
    // table, which is primary data in the manifest)
    val viaManifest = rows(cs.members().orderBy("tick", "rev", "doc_id"))
    fsys.delete(mV, true)
    assert(rows(cs.members().orderBy("tick", "rev", "doc_id"))
      === viaManifest,
      "manifest-resolved member reads ≡ the listing fallback")
  }

  test("dir-kind keying across a compaction (r14 item 1): a kindless certificate never covers a fold epoch; the fold records with its full doc set; certificateFor resolves a historical job's complete certificate after the store state moved on (r14 item 4)") {
    val root = Files.createTempDirectory("graft_consume_fold").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exf")
    val t1 = docs.filter(m.between(1, 9))
    val t2 = docs.filter(m === 0)
    ex.bootstrap(t1, ms)
    ex.appendDocsAt(2, t2, ms)
    val cs = ArtifactStore.consumption(spark, root, "exf")
    val srcs = docs.select("doc_id", "source")
    val noTombs = docs.select("doc_id").limit(0)
    def certify() = ex.certify(srcs, noTombs,
      minFillMicro = 0L, mixTolMicros = 1000000L)

    // job1 consumes the pre-compaction state; tick 2 serves at rev=1,
    // so the (tick=2, rev=1) pair — and its member dir — now exist
    cs.record("job1", ex, certify())
    val job1Cert = cs.certificateFor("job1")
      .orderBy("tick").collect()
    assert(job1Cert.length === 2 &&
      job1Cert.forall(r => r.getAs[String]("decision") == "serve" &&
        r.getAs[String]("dir_kind") == "tick" &&
        r.getAs[Long]("n_tokens") > 0L),
      "record folds the full certificate rows into the manifest")

    // materialize the PRE-compaction certificate (the stale-cert trap:
    // its plan reads paths the compaction deletes)
    val stale = certify().localCheckpoint()

    // the COMPACTION: both epochs fold; the fold's rev numbering
    // restarts at 1, colliding with the sealed (tick=2, rev=1) pair
    assert(ex.compactEpochs() === 2L)

    // a kindless certificate — even one re-computed at the current
    // state — can never cover a fold epoch: the kind must have been
    // stamped when the stats were computed (seal), else a stale
    // pre-compaction certificate would slip through the same door
    val e1 = intercept[IllegalArgumentException] {
      cs.record("job2", ex, stale)
    }
    assert(e1.getMessage.contains("no certificate"),
      "a stale pre-compaction certificate must not cover the fold")
    val e2 = intercept[IllegalArgumentException] {
      cs.record("job2", ex, certify())
    }
    assert(e2.getMessage.contains("no certificate"),
      "a kindless certificate must not cover a fold epoch — fold " +
        "coverage demands a seal()-stamped kind")

    // the structural path: seal at the post-compaction quiesce point,
    // then record — the fold's membership is its FULL doc set even
    // though a pre-compaction member dir shares its (tick, rev)
    ex.seal(srcs, noTombs, minFillMicro = 0L, mixTolMicros = 1000000L)
    cs.record("job2", ex)
    val j2 = cs.jobs().filter(col("job_id") === "job2").collect()
    assert(j2.map(r => (r.getAs[Long]("tick"), r.getAs[Long]("rev"),
      r.getAs[String]("dir_kind"))).toSeq === Seq((2L, 1L, "fold")))
    val foldMembers = cs.members().filter(col("dir_kind") === "fold")
    assert(foldMembers.select("doc_id").distinct().count() ===
      ex.slices().select("doc_id").distinct().count(),
      "the fold member dir holds the fold's full doc set")
    val tickMembers2 = cs.members()
      .filter(col("dir_kind") === "tick" && col("tick") === 2)
    assert(tickMembers2.count() > 0 &&
      tickMembers2.count() < foldMembers.count(),
      "the pre-compaction (tick=2, rev=1) member dir survives " +
        "unchanged next to the fold's — the kind keeps them apart")

    // trainedOn attributes a doc folded in from tick 1 to job2 (fold
    // consumption) AND to job1 (pre-compaction tick consumption) —
    // the kind-blind join would have attributed the fold rows to the
    // wrong job's epochs
    import spark.implicits._
    val t1probe = t1.select("doc_id").limit(1)
    val who = cs.trainedOn(t1probe).select("job_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(who === Set("job1", "job2"),
      "a folded-in doc traces to both the tick consumer and the fold " +
        "consumer")

    // item 4: job1's FULL certificate still resolves from the ledger
    // alone — the export store's cert revisions and the pre-compaction
    // epochs are gone, but the manifest kept the rows; the historical
    // stats are byte-identical to what record stamped
    val job1CertAfter = cs.certificateFor("job1")
      .orderBy("tick").collect()
    assert(job1CertAfter.map(_.toSeq).toSeq ===
      job1Cert.map(_.toSeq).toSeq,
      "a historical job's certificate is immutable and fully " +
        "resolvable after compaction + re-seal")
    assert(cs.certificateFor("job2").count() === 1L,
      "the fold consumer's certificate resolves too")
  }

  test("ledger lifecycle (two compactions + a takedown, five jobs): keys stay unambiguous through repeated rev-number reuse, attribution is exact at every step, history and certificates are immutable, gc frees nothing reachable") {
    val root = Files.createTempDirectory("graft_consume_life").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exl")
    val cs = ArtifactStore.consumption(spark, root, "exl")
    val srcs = docs.select("doc_id", "source")
    // three disjoint doc populations: A (epoch 1), B (epoch 2),
    // C (epoch 3, appended after the first compaction)
    val dA = docs.filter(m.between(1, 9))
    val dB = docs.filter(m === 0)
    val dC = docs.filter(m >= 10)
    val noTombs = docs.select("doc_id").limit(0)
    def seal(tombs: DataFrame) = ex.seal(srcs, tombs,
      minFillMicro = 0L, mixTolMicros = 1000000L)
    def keysOf(job: String) = cs.jobs().filter(col("job_id") === job)
      .select("tick", "rev", "dir_kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def namedBy(probe: DataFrame) = cs.trainedOn(probe)
      .select("job_id").distinct().collect().map(_.getString(0)).toSet

    // tick era: two epochs, job1
    ex.bootstrap(dA, ms)
    ex.appendDocsAt(2, dB, ms)
    seal(noTombs); cs.record("job1", ex)
    assert(keysOf("job1") === Set((1L, 1L, "tick"), (2L, 1L, "tick")))
    val job1Cert0 = cs.certificateFor("job1").orderBy("tick").collect()
      .map(_.toSeq).toSeq

    // first compaction: fold=2 rev=1 collides with job1's (2,1) pair
    assert(ex.compactEpochs() === 2L)
    seal(noTombs); cs.record("job2", ex)
    assert(keysOf("job2") === Set((2L, 1L, "fold")))

    // growth above the boundary; job3 consumes fold + fresh tick
    ex.appendDocsAt(3, dC, ms)
    seal(noTombs); cs.record("job3", ex)
    assert(keysOf("job3") === Set((2L, 1L, "fold"), (3L, 1L, "tick")))

    // the takedown: q117 class within A — re-packs the FOLD dir only
    // (C's tick carries none of A), advancing it to rev=2
    val retracted = dA.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) ===
        Provenance.RetractRem)
    assert(retracted.count() > 0)
    assert(ex.retractDocs(retracted) === Seq(2L))
    seal(retracted); cs.record("job4", ex)
    assert(keysOf("job4") === Set((2L, 2L, "fold"), (3L, 1L, "tick")))

    // second compaction: fold=3 rev=1 — the SAME collision shape
    // against job3/job4's (3,1,tick), one era later
    assert(ex.compactEpochs() === 2L)
    seal(retracted); cs.record("job5", ex)
    assert(keysOf("job5") === Set((3L, 1L, "fold")))

    // attribution is exact at every key-reuse boundary:
    //  - a RETRACTED A doc was consumed by job1 (tick era), job2 and
    //    job3 (pre-takedown fold), never by job4/job5 (post-re-pack)
    val aProbe = retracted.orderBy("doc_id").limit(1)
    assert(namedBy(aProbe) === Set("job1", "job2", "job3"))
    //  - a B doc flows through every era: tick 2, both fold=2 revs,
    //    and the final fold=3
    val bProbe = dB.select("doc_id").orderBy("doc_id").limit(1)
    assert(namedBy(bProbe) === Set("job1", "job2", "job3", "job4", "job5"))
    //  - a C doc exists only from epoch 3 on
    val cProbe = dC.select("doc_id").orderBy("doc_id").limit(1)
    assert(namedBy(cProbe) === Set("job3", "job4", "job5"))

    // the audit names exactly the pre-takedown consumers of retracted
    // docs, while every job reads certified (each recorded under a
    // clean seal)
    val aud = cs.audit(retracted).collect()
      .map(r => r.getAs[String]("job_id") ->
        (r.getAs[Long]("n_retracted_trained"), r.getAs[Boolean]("certified")))
      .toMap
    assert(aud.keySet === Set("job1", "job2", "job3", "job4", "job5"))
    assert(aud.filter(_._2._1 > 0).keySet === Set("job1", "job2", "job3"),
      "exactly the pre-takedown consumers trained on retracted docs")
    assert(aud.values.forall(_._2), "every job was certified at record time")

    // history + certificates immutable across the whole lifecycle;
    // every job's certificate resolves from the ledger alone
    assert(cs.certificateFor("job1").orderBy("tick").collect()
      .map(_.toSeq).toSeq === job1Cert0,
      "job1's certificate is byte-identical after two compactions, " +
        "four re-seals, and a takedown")
    Seq("job2", "job3", "job4", "job5").foreach { j =>
      assert(cs.certificateFor(j).count() === keysOf(j).size.toLong,
        s"$j resolves one certificate row per consumed epoch")
    }

    // gc at the end of the lifecycle frees only unreachable state
    val before = rows(cs.audit(retracted))
    cs.gc(); ex.gc()
    assert(rows(cs.audit(retracted)) === before,
      "ledger + export gc must not disturb any audit-reachable state")
    assert(namedBy(aProbe) === Set("job1", "job2", "job3"))
  }
}
