package graft.io

import java.nio.file.Files

import graft.TestSpark
import graft.operators.{Bpe, Packing, Provenance}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained packed-sequence export (q125) — the takedown leg
  * reaching the PHYSICAL TRAINING SHARDS: [[ArtifactStore
  * .PackedExportStore]] must serve manifests equal to the live
  * [[Packing.q125ExportRetraction]], re-pack ONLY affected ticks on a
  * takedown (from stored counts — no text), keep untouched epochs'
  * revisions byte-identical, survive a crash between revision write and
  * `_SUCCESS`, and stay idempotent under a replayed takedown. sf0.01. */
class ExportStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val seqLen = 2048

  private def docs = Tables.load(spark, sf, "documents")
  private def m = pmod(col("doc_id"), lit(Provenance.BatchMod))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)))

  private def sliceSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "seq_id", "toks", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("store form ≡ live q125; takedown re-packs only affected ticks, " +
       "bit-equal to a text-side re-export without the docs") {
    val root = Files.createTempDirectory("graft_export").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exp1", seqLen)
    val t1 = docs.filter(m.between(1, 9))
    val t2 = docs.filter(m === 0)
    ex.bootstrap(t1, ms)
    ex.appendDocsAt(2, t2, ms)
    assert(ex.maxTick === 2L)

    // pre-takedown: tick 1's slices ≡ the text-side pack of its docs
    assert(sliceSet(ex.slices().filter(col("tick") === 1)) ===
      sliceSet(Packing.tickSlices(t1, seqLen, ms)))

    // the takedown: tick-1 docs with id % RetractMod == RetractRem
    val retracted = t1.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)
    assert(retracted.count() > 0)
    val affected = ex.retractDocs(retracted)
    assert(affected === Seq(1L), "only tick 1 contains retracted docs")

    // post-takedown manifest ≡ the live oracle-checked q125
    assert(rows(ex.manifest()) ===
      rows(Packing.q125ExportRetraction(docs, seqLen)),
      "served manifest must equal the live q125 form")

    // the repacked tick ≡ a from-scratch TEXT-side export without the
    // retracted docs (retraction ≡ re-export-without, bit-equal slices)
    val surviving = t1.join(retracted, Seq("doc_id"), "left_anti")
    assert(sliceSet(ex.slices().filter(col("tick") === 1)) ===
      sliceSet(Packing.tickSlices(surviving, seqLen, ms)))

    // a REPLAYED takedown is a no-op in effect: identical slices
    val before = sliceSet(ex.slices())
    ex.retractDocs(retracted)
    assert(sliceSet(ex.slices()) === before)
  }

  test("tick-granular rebuild: an untouched epoch's revision directory " +
       "is not rewritten by a takedown") {
    val root = Files.createTempDirectory("graft_export").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exp2", seqLen)
    ex.bootstrap(docs.filter(m.between(1, 9)), ms)
    ex.appendDocsAt(2, docs.filter(m === 0), ms)

    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def revStamp(t: Long): Seq[(String, Long)] =
      fs.listStatus(new Path(s"$root/export_state/exp2/tick=$t")).toSeq
        .map(s => (s.getPath.getName, s.getModificationTime)).sorted
    val t2Before = revStamp(2)

    val retracted = docs.filter(m.between(1, 9)).select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)
    assert(ex.retractDocs(retracted) === Seq(1L))
    assert(revStamp(2) === t2Before,
      "tick 2's serving revision must be untouched")
    // tick 1 moved to rev 2; rev 1 is gone after the commit
    assert(fs.exists(new Path(s"$root/export_state/exp2/tick=1/rev=2/_SUCCESS")))
    assert(!fs.exists(new Path(s"$root/export_state/exp2/tick=1/rev=1")))
  }

  test("crash discipline: a revision without _SUCCESS is invisible — " +
       "the previous revision keeps serving bit-for-bit") {
    val root = Files.createTempDirectory("graft_export").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exp3", seqLen)
    val t1 = docs.filter(m.between(1, 9))
    ex.bootstrap(t1, ms)
    val served = sliceSet(ex.slices())

    // simulate a takedown crashed between data write and _SUCCESS:
    // copy rev=1 to rev=2, drop the marker
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val r1 = new Path(s"$root/export_state/exp3/tick=1/rev=1")
    val r2 = new Path(s"$root/export_state/exp3/tick=1/rev=2")
    org.apache.hadoop.fs.FileUtil.copy(fs, r1, fs, r2, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(r2, "_SUCCESS"), false)

    assert(sliceSet(ex.slices()) === served,
      "an uncommitted revision must not serve")
    // and the retried takedown lands cleanly as rev 3
    val retracted = t1.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)
    ex.retractDocs(retracted)
    assert(fs.exists(new Path(s"$root/export_state/exp3/tick=1/rev=3/_SUCCESS")))
    assert(sliceSet(ex.slices()) ===
      sliceSet(Packing.tickSlices(
        t1.join(retracted, Seq("doc_id"), "left_anti"), seqLen, ms)))
  }

  test("tokenizer swap between epochs (the q119 choice feeding the export): " +
       "new epochs pack under the new merges, old epochs are untouched") {
    val root = Files.createTempDirectory("graft_export").toString
    val t1 = docs.filter(m.between(1, 9))
    val t2 = docs.filter(m === 0)
    val msOld = Bpe.merges(t1)           // bootstrap-corpus tokenizer
    val msNew = Bpe.merges(docs)         // the q119 'fresh' choice
    val ex = ArtifactStore.packedExport(spark, root, "exp_swap", seqLen)
    ex.bootstrap(t1, msOld)
    val epoch1 = sliceSet(ex.slices().filter(col("tick") === 1))

    // the swap: the next epoch packs under the CHOSEN merges — epochs
    // are tick-local, so history is never re-packed implicitly (a
    // deployment that wants old epochs under the new tokenizer
    // re-exports them deliberately, the q108 full form)
    ex.appendDocsAt(2, t2, msNew)
    assert(sliceSet(ex.slices().filter(col("tick") === 1)) === epoch1,
      "the tokenizer swap must not touch already-exported epochs")
    assert(sliceSet(ex.slices().filter(col("tick") === 2)) ===
      sliceSet(Packing.tickSlices(t2, seqLen, msNew)),
      "the new epoch must pack under the chosen merges")
    assert(sliceSet(ex.slices().filter(col("tick") === 2)) !==
      sliceSet(Packing.tickSlices(t2, seqLen, msOld)),
      "the swap must be observable (different token counts repack)")

    // and a takedown on the old epoch still re-packs under ITS stored
    // counts — the repack never re-tokenizes, so the tokenizer that
    // packed an epoch is baked into its rows
    val retracted = t1.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)
    ex.retractDocs(retracted)
    assert(sliceSet(ex.slices().filter(col("tick") === 1)) ===
      sliceSet(Packing.tickSlices(
        t1.join(retracted, Seq("doc_id"), "left_anti"), seqLen, msOld)),
      "post-swap takedowns re-pack old epochs under their own tokenizer")
  }

  test("shard reader contract: partition-pruned shard reads union to the " +
       "full export, and no sequence is torn across shards") {
    val root = Files.createTempDirectory("graft_export").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exp4", seqLen)
    ex.bootstrap(docs.filter(m.between(1, 9)), ms)
    ex.appendDocsAt(2, docs.filter(m === 0), ms)

    // every (tick, seq) lives in exactly one shard
    val torn = ex.slices().groupBy("tick", "seq_id")
      .agg(countDistinct("shard").as("n"))
      .filter(col("n") > 1).count()
    assert(torn === 0L, "a sequence must never be torn across shards")

    // per-shard reads cover the whole export exactly once
    val whole = ex.slices().count()
    val shards = ex.slices().select("shard").distinct()
      .collect().map(_.getLong(0))
    assert(shards.map(s => ex.readShard(s).count()).sum === whole)

    // manifest totals reconcile with the physical rows
    val manTok = ex.manifest().agg(sum("n_tokens")).head().getLong(0)
    val rowTok = ex.slices().agg(sum("toks")).head().getLong(0)
    assert(manTok === rowTok)
  }

  test("epoch compaction: fold ≡ one-epoch re-pack from stored counts, maxTick fixed, " +
       "crash leaves old epochs serving, post-fold takedown and append compose") {
    val root = Files.createTempDirectory("graft_export").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "exp6", seqLen)
    // three micro-batch-sized epochs (the streaming-fold shape)
    val parts = Seq(m.between(1, 3), m.between(4, 6), m.between(7, 9))
      .map(p => docs.filter(p))
    ex.bootstrap(parts(0), ms)
    ex.appendDocsAt(2, parts(1), ms)
    ex.appendDocsAt(3, parts(2), ms)
    val tokBefore = ex.slices().agg(sum("toks")).head().getLong(0)
    val seqsBefore = ex.manifest().agg(sum("n_seqs")).head().getLong(0)

    // CRASH seam first: a fold revision present WITHOUT its _SUCCESS
    // while every tick dir still stands — the exact double-serving
    // window the fold=/boundary layout exists to close. The old three
    // epochs must keep serving exactly as before.
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val served = sliceSet(ex.slices())
    val t3rev = new Path(s"$root/export_state/exp6/tick=3/rev=1")
    val foldRev = new Path(s"$root/export_state/exp6/fold=3/rev=1")
    org.apache.hadoop.fs.FileUtil.copy(fs, t3rev, fs, foldRev, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(foldRev, "_SUCCESS"), false)
    assert(ex.ticks === Seq(1L, 2L, 3L),
      "an uncommitted fold must hide nothing")
    assert(sliceSet(ex.slices()) === served,
      "an uncommitted fold must serve nothing")

    // the re-run lands the fold as the dir's next revision and commits
    val ex2 = ex
    assert(ex2.compactEpochs() === 3L)
    assert(fs.exists(
      new Path(s"$root/export_state/exp6/fold=3/rev=2/_SUCCESS")))
    assert(ex2.ticks === Seq(3L), "the fold serves as epoch 3 alone")
    assert(ex2.maxTick === 3L, "compaction must not move the tick agreement")
    // fold ≡ a one-epoch pack of all the docs (zero re-tokenizes is
    // structural: compactEpochs reads only stored (doc_id,toks,h) rows)
    val allDocs = parts.reduce(_.union(_))
    assert(sliceSet(ex2.slices()) ===
      sliceSet(Packing.tickSlices(allDocs, seqLen, ms)))
    assert(ex2.slices().agg(sum("toks")).head().getLong(0) === tokBefore,
      "token totals are fold-invariant")
    assert(ex2.manifest().agg(sum("n_seqs")).head().getLong(0) <= seqsBefore,
      "folding can only reduce tail sequences")
    // re-run after commit: single served epoch ≤ upTo → no-op
    assert(ex2.compactEpochs() === 0L)

    // post-fold composition: a takedown re-packs the FOLD dir; a new
    // epoch appends above the boundary; appending into folded history throws
    val retracted = allDocs.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)
    ex2.retractDocs(retracted)
    assert(sliceSet(ex2.slices()) === sliceSet(Packing.tickSlices(
      allDocs.join(retracted, Seq("doc_id"), "left_anti"), seqLen, ms)))
    ex2.appendDocsAt(4, docs.filter(m === 0), ms)
    assert(ex2.ticks === Seq(3L, 4L))
    intercept[IllegalArgumentException](ex2.appendDocsAt(2, parts(1), ms))
  }

  test("release gate (q132): store certify ≡ live values; all four decisions staged; the q125 re-pack flips hold_takedown to serve") {
    val root = Files.createTempDirectory("graft_export_gate").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "gate1", seqLen)
    val t1 = docs.filter(m.between(1, 9))
    val t2 = docs.filter(m === 0)
    ex.bootstrap(t1, ms)
    ex.appendDocsAt(2, t2, ms)
    val srcs = docs.select("doc_id", "source")
    val retracted = t1.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) === Provenance.RetractRem)

    // pre-re-pack: tick 1 still carries the taken-down docs → held;
    // values ≡ the live q132 frame's (tick=1, rev=0) row (certificate
    // columns — rev numbering is the store's own)
    val live = Packing.q132ExportReleaseGate(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    val pre = ex.certify(srcs, retracted).collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(2)).toMap
    assert(pre(1) === live((1, 0)),
      "pre-re-pack tick 1 must certify exactly like the live rev-0 epoch")
    assert(pre(1).last === "hold_takedown")
    assert(pre(2) === live((2, 0)),
      "tick 2 must certify exactly like the live tick-2 epoch")

    // the q125 re-pack is the remediation: tick 1 now serves, with the
    // live rev-1 certificate values
    ex.retractDocs(retracted)
    val post = ex.certify(srcs, retracted).collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(2)).toMap
    assert(post(1) === live((1, 1)),
      "post-re-pack tick 1 must certify exactly like the live rev-1 epoch")
    assert(post(1).last === "serve")
    // (tick 2 at sf0.01 is a 30-doc epoch — 3 sequences at 79 % fill —
    // so the live frame itself stages hold_fill there; at bench scales
    // it serves. The pre(2) ≡ live((2,0)) equality above pins it.)

    // hold_fill: a near-empty epoch (a handful of docs in one mostly
    // empty sequence) fails the fill floor
    ex.appendDocsAt(3, t2.limit(3), ms)
    val withTiny = ex.certify(srcs, retracted).collect()
      .map(r => r.getInt(0) -> r.getString(8)).toMap
    assert(withTiny(3) === "hold_fill")

    // hold_mix: an epoch drawn from ONE source deviates past the
    // tolerance while passing fill (enough docs to pack full
    // sequences); retracted docs excluded so liveness passes too
    val s0 = docs.select("source").orderBy("source").limit(1)
      .head().getString(0)
    val oneSrc = docs.filter(col("source") === s0)
      .join(retracted, Seq("doc_id"), "left_anti")
      .orderBy("doc_id").limit(60)
    ex.appendDocsAt(4, oneSrc, ms)
    val withSkew = ex.certify(srcs, retracted).collect()
      .map(r => r.getInt(0) -> r.getString(8)).toMap
    assert(withSkew(4) === "hold_mix",
      "a single-source epoch must hold on the mix certificate")
  }

  test("serve-boundary certification (r13 item 1): servedSlices refuses an unsealed store, any revision advance past the recorded seal, and a held epoch; the structural record() overload enforces the same gate") {
    val root = Files.createTempDirectory("graft_export_seal").toString
    val ms = Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, root, "seal1", seqLen)
    val t1 = docs.filter(m.between(1, 9))
    val t2 = docs.filter(m === 0)
    ex.bootstrap(t1, ms)
    val srcs = docs.select("doc_id", "source")
    val none = docs.select("doc_id").limit(0)
    val cs = ArtifactStore.consumption(spark, root, "seal1")
    // fill/mix relaxed throughout — the four decisions are the q132
    // test's subject; this test pins WHERE the gate binds
    def seal(tombs: DataFrame) = ex.seal(srcs, tombs,
      minFillMicro = 0L, mixTolMicros = 1000000L)

    // 1. never sealed: the training read path AND the structural record
    // refuse before any data read
    val e1 = intercept[IllegalArgumentException] { ex.servedSlices() }
    assert(e1.getMessage.contains("no recorded certificate"))
    val e2 = intercept[IllegalArgumentException] { cs.record("job1", ex) }
    assert(e2.getMessage.contains("no recorded certificate"))

    // 2. sealed at quiesce: served ≡ maintenance slices; the structural
    // record streams with the recorded certificate stamped
    seal(none)
    assert(sliceSet(ex.servedSlices()) === sliceSet(ex.slices()),
      "a fully-certified store serves its slices unchanged")
    cs.record("job1", ex)
    val j1 = cs.jobs().filter(col("job_id") === "job1").collect()
    assert(j1.nonEmpty && j1.forall(_.getAs[String]("decision") == "serve"),
      "the structural record stamps the recorded certificate")

    // 3. an APPEND advances past the seal: unserveable until re-sealed
    ex.appendDocsAt(2, t2, ms)
    val e3 = intercept[IllegalArgumentException] { ex.servedSlices() }
    assert(e3.getMessage.contains("advanced past the recorded certificate"))
    val e3r = intercept[IllegalArgumentException] { cs.record("job2", ex) }
    assert(e3r.getMessage.contains("no certificate"))
    seal(none)
    assert(ex.servedSlices().filter(col("tick") === 2).count() > 0)
    cs.record("job2", ex)

    // 4. a HELD decision refuses at the read path (takedown staged but
    // epochs not yet re-packed)
    val retracted = t1.select("doc_id").filter(
      pmod(col("doc_id"), lit(Provenance.RetractMod)) ===
        Provenance.RetractRem)
    val heldCert = seal(retracted)
    assert(heldCert.filter(col("decision") === "hold_takedown").count() > 0)
    val e4 = intercept[IllegalArgumentException] { ex.servedSlices() }
    assert(e4.getMessage.contains("held epochs"))
    // remediation: the q125 re-pack (which itself advances revisions
    // out from under the held seal) + re-seal
    ex.retractDocs(retracted)
    seal(retracted)
    assert(ex.servedSlices().count() > 0,
      "re-packed + re-sealed epochs serve again")

    // 5. COMPACTION advances too — the fold is new physical data, and
    // its rev numbering RESTARTS at 1, colliding with the sealed
    // (tick=2, rev=1) pair: the gate must key on the full (tick, rev,
    // dir_kind) triple (r14 verdict item 1), so a record BEFORE the
    // re-seal refuses instead of admitting the fold under the stale
    // pre-compaction certificate
    assert(ex.compactEpochs() > 0)
    val e5 = intercept[IllegalArgumentException] { ex.servedSlices() }
    assert(e5.getMessage.contains("advanced past the recorded certificate"))
    val e5r = intercept[IllegalArgumentException] { cs.record("job3", ex) }
    assert(e5r.getMessage.contains("no certificate"),
      "a record between the compaction and the re-seal must refuse — " +
        "the fold's (tick, rev) collides with a sealed pre-compaction " +
        "pair and only the dir kind tells them apart")
    seal(retracted)
    assert(sliceSet(ex.servedSlices()) === sliceSet(ex.slices()))

    // ... and the re-sealed fold records with the FOLD's full doc set:
    // job2's pre-compaction member dir shares the fold's (tick, rev),
    // so a kind-blind member key would silently reuse the old tick-only
    // membership, losing every doc folded in from earlier epochs
    cs.record("job3", ex)
    val foldDocs = ex.slices().select("doc_id").distinct().count()
    val j3members = cs.members()
      .join(cs.jobs().filter(col("job_id") === "job3")
        .select("tick", "rev", "dir_kind"),
        Seq("tick", "rev", "dir_kind"), "left_semi")
    assert(j3members.select("doc_id").distinct().count() === foldDocs,
      "the fold epoch's harvested membership is the fold's FULL doc " +
        "set, not the pre-compaction tick's")
    assert(cs.jobs().filter(col("job_id") === "job3")
      .select("dir_kind").collect().map(_.getString(0)).toSeq ===
      Seq("fold"),
      "job3's consumption row names the fold dir kind")
    // job2's pre-compaction rows are untouched history: same (tick,
    // rev) pair, tick kind, tick-only membership
    val j2members = cs.members()
      .join(cs.jobs().filter(col("job_id") === "job2")
        .filter(col("tick") === 2)
        .select("tick", "rev", "dir_kind"),
        Seq("tick", "rev", "dir_kind"), "left_semi")
    assert(j2members.select("doc_id").distinct().count() < foldDocs,
      "the pre-compaction member dir keeps its tick-only doc set")
  }
}
