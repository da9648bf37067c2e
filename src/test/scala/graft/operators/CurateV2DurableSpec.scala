package graft.operators

import java.nio.file.Files

import graft.TestSpark
import graft.io.{ArtifactStore, Tables}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Durable composed-pipeline checkpoints (r8 verdict Missing #4): the
  * q84/q91/q95 stage state parked as fingerprint-keyed ArtifactStore
  * parquet instead of `localCheckpoint`, so a crashed run RESUMES from
  * its completed gates — in a different session — and produces a
  * bit-identical report without re-executing them. */
class CurateV2DurableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs(s: org.apache.spark.sql.SparkSession = spark) =
    Tables.load(s, sf, "documents")
  private def embs(s: org.apache.spark.sql.SparkSession = spark) =
    Tables.load(s, sf, "embeddings")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)))

  /** Simulated executor/driver loss: forwards to the durable store and
    * dies after `failAfter` fresh stage computations. */
  private final class Crash extends RuntimeException("simulated crash")
  private final class CrashingStore(inner: ArtifactStore.DurableStageStore,
                                    failAfter: Int) extends StageStore {
    override def materialize(name: String, df: DataFrame): DataFrame = {
      val fresh = !new java.io.File(inner.stagePath(name), "_SUCCESS").exists()
      if (fresh && inner.computed.size >= failAfter) throw new Crash
      inner.materialize(name, df)
    }
  }

  test("q84 durable: crash after 4 stages, resume in a FRESH session — completed gates load, report is bit-identical") {
    val root = Files.createTempDirectory("graft_curate_durable").toString

    // The yardstick: the default localCheckpoint run.
    val expected = rows(CurateV2.q84CurationPipeline(docs(), embs()))

    // Run 1: durable store, killed after the 4th fresh stage write
    // (base1, lmflag2, keep3, lose4 — i.e. stages 1-4 complete).
    val store1 = ArtifactStore.curateStageStore(root, docs(), embs())
    intercept[Crash] {
      // collect() forces the stages in materialization order
      CurateV2.q84CurationPipeline(docs(), embs(),
        store = new CrashingStore(store1, failAfter = 4)).collect()
    }
    assert(store1.computed === Seq("base1", "lmflag2", "keep3", "lose4"),
      "crash must land after exactly the first four stage artifacts")

    // Run 2: a FRESH session (new session state; the durable artifacts
    // are the only carried-over pipeline state) resumes with the same
    // corpus + knobs → same pipeline key.
    val spark2 = spark.newSession()
    val store2 = ArtifactStore.curateStageStore(root, docs(spark2), embs(spark2))
    assert(store2.pipelineKey === store1.pipelineKey,
      "same corpus + knobs must resolve to the same pipeline key")
    val resumed = rows(CurateV2.q84CurationPipeline(docs(spark2), embs(spark2),
      store = store2))

    assert(resumed === expected,
      "resumed report must be bit-identical to the single-run report")
    assert(store2.loaded === Seq("base1", "lmflag2", "keep3", "lose4"),
      "completed gates must be SERVED from artifacts, not recomputed")
    assert(store2.computed === Seq("lose5", "dirty6"),
      "only the unfinished gates may execute on resume")
  }

  test("a changed knob gets a new pipeline key: stale stage state is never served") {
    val root = Files.createTempDirectory("graft_curate_keys").toString
    val a = ArtifactStore.curateStageStore(root, docs(), embs())
    val b = ArtifactStore.curateStageStore(root, docs(), embs(),
      paramsKey = "qmin=0.5")
    assert(a.pipelineKey !== b.pipelineKey)
    // and a changed corpus too (drop one doc)
    val c = ArtifactStore.curateStageStore(root,
      docs().filter("doc_id <> 1"), embs())
    assert(a.pipelineKey !== c.pipelineKey)
  }

  test("durable entry points derive the params key from their OWN knobs: changed qmin → fresh stage keys, no stale serve") {
    val root = Files.createTempDirectory("graft_curate_autokey").toString
    // Run 1 at default knobs through the auto-keyed entry point.
    val expectedDefault = rows(CurateV2.q84CurationPipeline(docs(), embs()))
    assert(rows(CurateV2.q84Durable(root, docs(), embs())) === expectedDefault)
    // Run 2 at qmin = 0.6 through the SAME root: the entry point builds
    // a different pipelineKey from its own argument, so no stage
    // artifact of run 1 can be served — the report must equal a clean
    // qmin = 0.6 run, not a half-stale hybrid.
    val expectedStrict =
      rows(CurateV2.q84CurationPipeline(docs(), embs(), qmin = 0.6))
    assert(rows(CurateV2.q84Durable(root, docs(), embs(), qmin = 0.6))
      === expectedStrict)
    assert(expectedStrict !== expectedDefault,
      "qmin change must actually move the report for this pin to bite")
    // Two distinct pipelineKey directories exist under the root.
    val keys = ArtifactStore.listArtifacts(spark, root).map(_._1).distinct
    assert(keys.size === 2,
      s"expected one stage tree per knob set, got $keys")
    // And the v3/v4 durable forms key on their extra knobs too.
    val k1 = CurateV2.durableParamsKey(0.4, LmScore.DefaultFlagBits, 0.2,
      0.4, Kmeans.DefaultK, 8, 50, 7)
    val k2 = CurateV2.durableParamsKey(0.4, LmScore.DefaultFlagBits, 0.2,
      0.4, Kmeans.DefaultK, 8, 50, 7, fuzzyThreshold = 0.3)
    assert(k1 !== k2)
  }

  test("durable q95 stage state is manifest-listable like any artifact") {
    val root = Files.createTempDirectory("graft_curate_list").toString
    val store = ArtifactStore.curateStageStore(root, docs(), embs())
    CurateV2.q95CurationV4(docs(), embs(), store = store).collect()
    val listed = ArtifactStore.listArtifacts(spark, root)
    val stages = listed.filter(_._1 == s"curate_${store.pipelineKey}").map(_._2)
    assert(stages.toSet === Set("base1", "lmflag2", "keep3", "lose4",
      "lose5", "dirty6", "lose7", "trim8"))
  }
}
