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

    cs.record("job1", ex)
    val job1Rows = rows(cs.jobs().filter(col("job_id") === "job1")
      .orderBy("tick"))

    // the takedown: re-pack both epochs without the retracted docs
    val retracted = docs.filter((m.between(1, 9) || m === 0) &&
        pmod(col("doc_id"), lit(Provenance.RetractMod)) ===
          Provenance.RetractRem)
      .select("doc_id")
    assert(ex.retractDocs(retracted) === Seq(1L, 2L))
    cs.record("job2", ex)

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
    cs.record("job2", ex)
    assert(rows(cs.audit(retracted)) === live)
  }
}
