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
    assert(job1Rows.forall(r => r(4) == "serve" &&
      r(5).asInstanceOf[Long] != 0L),
      "job rows carry the stamped decision and certificate signature")

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
    fsys.delete(staleRev, true)

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
      Seq(Seq("job0", 1L, 1L, 0L, "unrecorded", 0L)),
      "legacy job rows surface with sentinel certificate columns")
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
}
