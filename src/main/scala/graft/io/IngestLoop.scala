package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, Provenance, QualityModel}

/** The DEPLOYMENT form of the multi-tick ingest loop (q106,
  * `Provenance.q106MultiTickIngest`) — the r9 verdict's top item: the
  * state-maintenance closure that makes tick N+1 reject near-dups of
  * what tick N admitted. Three [[ArtifactStore.IngestStateStore]]s
  * accumulate the corpus dedup state across ticks:
  *
  *   - `hashes`:   distinct 60-bit content hashes (`ch`) — exact gate
  *   - `bands`:    MinHash-LSH band rows (doc_id, band, x, y) — fuzzy
  *                 candidate generation
  *   - `shingles`: distinct 60-bit shingle hashes (doc_id, h) — fuzzy
  *                 exact verification
  *
  * [[bootstrap]] seeds all three from the existing corpus (tick 1 —
  * the ONLY time corpus text is read); each [[runTick]] judges its
  * batch against `current()` state (the q103 verdict precedence:
  * exact → fuzzy → low_quality → new) and appends the ADMITTED docs'
  * increments as the next tick — exact/fuzzy dups were never ingested
  * and low-quality docs were rejected, so neither enters the state,
  * and a near-dup of a tick-1 reject stays `new` at tick 2
  * (IngestLoopSpec pins both directions against the live q106).
  * [[compactIfNeeded]] folds the accumulated tick files into a
  * generation when their count crosses the trigger — the 100 TB
  * scan-throughput concern `IngestStateStore.compact` documents —
  * without changing any subsequent verdict (spec-pinned).
  *
  * Scale shape per tick: the batch derives hashes/bands/shingles
  * map-side from its own (tick-sized) text; the state side is probed
  * parquet — 8–26-byte rows, partitioned once, NEVER corpus text. The
  * one window is the tick-scoped budget rank (the q103 documented
  * exception). Fold-back writes are one small parquet append per
  * store. Difference vs the live q106 (documented, negligible): fuzzy
  * verification joins 60-bit shingle HASHES (the persisted state) not
  * shingle strings — identical up to 2^-60/pair md5 collisions
  * ([[Fuzzy.lshPairsAgainstState]]); the spec pins equality on real
  * data.
  */
object IngestLoop extends IngestLegOps with IngestMmOps {

  /** The state stores of one named ingest loop: three doc-keyed data
    * stores plus the RETRACTION tombstone store (r10 verdict item 1 —
    * the takedown leg). `hashes` rows are DOC-GRANULAR (doc_id, ch)
    * ([[Provenance.corpusDocHashes]]): retracting one of two ingested
    * docs that share a hash must keep the hash, which a bare distinct-ch
    * store cannot express. `tombs` holds (doc_id) rows of retracted
    * docs; EVERY state read anti-joins them ([[resolved]]), so
    * correctness never depends on whether a compaction has folded
    * tombstones into the generations — the anti-join is idempotent, and
    * a crash at any point of the fold sequence leaves verdicts
    * unchanged. */
  final case class Stores(hashes: ArtifactStore.IngestStateStore,
                          bands: ArtifactStore.IngestStateStore,
                          shingles: ArtifactStore.IngestStateStore,
                          tombs: ArtifactStore.IngestStateStore)

  def stores(spark: SparkSession, root: String, name: String): Stores =
    Stores(
      ArtifactStore.ingestState(spark, root, s"$name/hashes"),
      ArtifactStore.ingestState(spark, root, s"$name/bands"),
      ArtifactStore.ingestState(spark, root, s"$name/shingles"),
      ArtifactStore.ingestState(spark, root, s"$name/tombs"))

  /** A state frame minus the retracted docs — the ONE tombstone
    * application every read goes through (package-visible: the
    * streaming folds resolve their state reads through it too, so a
    * quiesce-point takedown between stream runs reaches the stream's
    * fuzzy/signature judgement as well). */
  private[graft] def resolved(st: Stores, df: DataFrame): DataFrame =
    st.tombs.current().fold(df)(tb =>
      df.join(tb.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))

  /** Seed the loop's state from the existing corpus — tick 1 in each
    * store, written IDEMPOTENTLY (`appendTickAt(1)`): a bootstrap that
    * crashed between the per-store writes is simply re-run and
    * overwrites the same tick-1 directories — the auto-increment
    * `appendTick` here would instead append a SECOND copy of the
    * corpus state, whose duplicate rows break the ≤1-match state join
    * and inflate fuzzy intersection counts (the review-found hazard).
    * The only corpus-text scan the loop ever performs. */
  def bootstrap(st: Stores, corpusDocs: DataFrame): Unit = {
    st.hashes.appendTickAt(1, Provenance.corpusDocHashes(corpusDocs))
    st.bands.appendTickAt(1, Fuzzy.corpusBandState(corpusDocs))
    st.shingles.appendTickAt(1, Fuzzy.corpusShingleHashes(corpusDocs))
  }

  /** RETRACT ingested documents (takedowns: copyright, post-admission
    * PII, re-judged docs) at DOCUMENT granularity — one tombstone
    * append; no state row is rewritten until the next compaction folds
    * the tombstones. After this, a retracted doc's hash leaves the
    * exact gate (unless a surviving ingested doc shares it), its
    * band/shingle rows leave the fuzzy gate — so its duplicates stop
    * being rejected and the doc itself is re-admittable — and, when
    * the loop serves retrieval, its BM25 postings leave the index
    * (df/dl/stats re-derive exactly; [[ArtifactStore
    * .Bm25IncrementalIndex.retractDocs]]). Run at quiesce points only
    * (no tick in flight), like compaction: a replayed crashed tick
    * must see the same tombstone set its first run did.
    *
    * Returns the tombstone tick number. The live, oracle-checked form
    * of the whole retraction loop is [[Provenance.q117RetractionTick]];
    * RetractionSpec pins this store form ≡ that live form. */
  def retractTick(st: Stores, docIds: DataFrame,
                  idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                  census: Option[(ArtifactStore.GramCensusIncrementalIndex,
                                  DataFrame)] = None,
                  ann: Option[ArtifactStore.IvfPqIncrementalIndex] = None,
                  export: Option[ArtifactStore.PackedExportStore] = None,
                  mix: Option[(ArtifactStore.MixIncrementalIndex, DataFrame)]
                    = None,
                  model: Option[ArtifactStore.ModelStore] = None,
                  quar: Option[Quarantine] = None,
                  replay: Option[ReplayLeg] = None,
                  sem: Option[SemLeg] = None,
                  eval: Option[EvalLeg] = None)
      : Long =
    retractTickImpl(st, Seq.empty, docIds, idx, census, ann, export, mix,
      model, quar, replay, sem, eval)

  /** [[retractTick]] for a MULTIMODAL loop: the per-modality signature
    * stores advance with the takedown tick too, so the next
    * [[runMmTick]]'s five-store agreement cannot land ON the takedown
    * tick and overwrite a subtraction leg. */
  def retractMmTick(st: MmStores, docIds: DataFrame,
                    idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                    census: Option[(ArtifactStore.GramCensusIncrementalIndex,
                                    DataFrame)] = None,
                    ann: Option[ArtifactStore.IvfPqIncrementalIndex] = None,
                    export: Option[ArtifactStore.PackedExportStore] = None,
                    mix: Option[(ArtifactStore.MixIncrementalIndex, DataFrame)]
                      = None,
                    model: Option[ArtifactStore.ModelStore] = None,
                    quar: Option[Quarantine] = None,
                    replay: Option[ReplayLeg] = None,
                    sem: Option[SemLeg] = None,
                    eval: Option[EvalLeg] = None)
      : Long =
    retractTickImpl(st.text, Seq(st.imgSigs, st.audSigs), docIds, idx,
      census, ann, export, mix, model, quar, replay, sem, eval)

  /** A TAKEDOWN IS A TICK (review finding, closed): the subtraction
    * legs (census, mix) land their negative increments as tick-keyed
    * writes, so every store ATTACHED to the deployment must advance to
    * the takedown tick `k` TOGETHER — stores with nothing to subtract
    * get an empty tick. Without this, the census/mix stores would sit
    * one tick ahead of the dedup stores, the next ingest tick's
    * agreement would resolve to `k`, and its fold-back would OVERWRITE
    * the negative increment — silently losing the takedown from the
    * maintained census/mix while every verdict still looked right.
    * The caller must pass the SAME legs its ticks run with (the
    * agreement contract runTick already imposes); pass-less stores
    * attached to the loop but omitted here would lag and force a
    * spurious redo — visible, not silent. Crash discipline: all leg
    * writes are keyed at `k` (a replayed partial takedown recomputes
    * the same `k` from the agreement max and overwrites idempotently);
    * the tombstone append runs LAST, and a takedown whose ids are all
    * already tombstoned is a complete-replay no-op. Streaming
    * deployments run takedowns at RESTART boundaries ([[rollover]]) —
    * batch-id-keyed fold ticks would otherwise collide with the
    * takedown tick. */
  private def retractTickImpl(st: Stores,
                              extraStores: Seq[ArtifactStore.IngestStateStore],
                              docIds: DataFrame,
                              idx: Option[ArtifactStore.Bm25IncrementalIndex],
                              census: Option[
                                (ArtifactStore.GramCensusIncrementalIndex,
                                 DataFrame)],
                              ann: Option[ArtifactStore.IvfPqIncrementalIndex],
                              export: Option[ArtifactStore.PackedExportStore],
                              mix: Option[(ArtifactStore.MixIncrementalIndex,
                                           DataFrame)],
                              model: Option[ArtifactStore.ModelStore],
                              quar: Option[Quarantine],
                              replay: Option[ReplayLeg],
                              sem: Option[SemLeg] = None,
                              eval: Option[EvalLeg] = None)
      : Long = {
    // Docs already tombstoned are dropped BEFORE any leg runs: the
    // anti-join legs (dedup stores, BM25 postings, IVF-PQ codes) are
    // naturally idempotent under a repeated takedown, but the census
    // leg SUBTRACTS (q123) — a double retraction would subtract twice.
    // The tombstone store is the existence check for all of them.
    val ids = docIds.select("doc_id")
    val fresh = st.tombs.current()
      .fold(ids)(tb =>
        ids.join(tb.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
      .localCheckpoint()
    if (fresh.isEmpty) return st.tombs.maxTick // complete-replay no-op
    // the semantic leg's sig rows and the decontam leg's docGram rows
    // carry doc_id, so the shared tombstone anti-join IS their
    // retraction (the bands/shingles algebra) — they only need the
    // empty takedown tick for the agreement
    val dataStores = Seq(st.hashes, st.bands, st.shingles) ++ extraStores ++
      quar.toSeq.flatMap(q => Seq(q.rows, q.resolvedIds)) ++
      replay.map(_.feats) ++ sem.map(_.sigs) ++ eval.map(_.docGrams)
    val k = nextTickOf((dataStores ++ idx.map(_.tfStore)
      ++ census.map(_._1.censusStore) ++ ann.map(_.codeStore)
      ++ mix.map(_._1.mixStore)).map(_.maxTick)
      ++ export.map(_.maxTick))
    def emptyTick(s: ArtifactStore.IngestStateStore): Unit =
      s.appendTickAt(k, s.current().get.limit(0))
    dataStores.foreach(emptyTick)
    idx.foreach { i => i.retractDocs(fresh); emptyTick(i.tfStore) }
    // census retraction needs the docs' TEXT (census rows carry no
    // doc_id to anti-join) — the caller passes the retracted documents
    census.foreach { case (cIdx, docs) =>
      cIdx.retractDocsAt(k, docs.join(fresh, Seq("doc_id"), "left_semi"))
    }
    // ANN leg (the q124 serving index): a takedown's code rows leave
    // every codes() read via the index's own vec_id tombstones —
    // idempotent anti-join, folded out at the index's next compaction
    // or baked into the next recluster's re-encode
    ann.foreach { a =>
      a.retractVectors(fresh.select(col("doc_id").as("vec_id")))
      emptyTick(a.codeStore)
    }
    // EXPORT leg (q125): re-pack the affected epochs from stored counts
    // so the physical training shards stop carrying the retracted docs
    // — naturally idempotent (a repeated repack reproduces identical
    // rows), still behind the tombstone existence check like every leg
    export.foreach { e => e.retractDocs(fresh); e.appendEmptyEpochAt(k) }
    // MIX leg (q127's state): subtraction, like the census — needs the
    // docs' source column, so the caller passes the document table
    mix.foreach { case (mIdx, docs) =>
      mIdx.retractDocsAt(k, docs.join(fresh, Seq("doc_id"), "left_semi"))
    }
    // MODEL leg (q128): unlearn — if the takedown reaches the serving
    // model's training sample, retrain from the persisted reservoir
    // (zero text reads); membership decision + generation swap live in
    // the store (not tick-keyed: generations). Behind the tombstone
    // check like the subtraction legs: a replayed takedown must not
    // re-shrink the reservoir.
    model.foreach(_.unlearn(fresh))
    st.tombs.appendTick(fresh)
  }

  /** Roll the loop into a FRESH store generation at a stream restart
    * boundary — the executable form of the streaming takedown
    * discipline ([[graft.streaming.DocStream.foldingMmAdmissionQuery]]'s
    * scaladoc): a Structured Streaming query restarted with a fresh
    * checkpoint resets micro-batch ids to 0, so its batch-id-keyed fold
    * ticks would COLLIDE with the previous run's; and the exact-hash
    * layer seeds from `corpusHashes` only at first start, so a takedown
    * of exact content needs a re-seed anyway. `rollover` snapshots the
    * old stores' RESOLVED state (tombstones baked in — one read per
    * store, no text) as tick 1 of a new store generation: the new run
    * folds from tick 2 up with no collisions, seeds its exact layer
    * from the new `hashes` tick-1 state, and every retracted doc's rows
    * are physically absent from the rolled state. DocStreamSpec pins
    * the full boundary flow: run → quiesce takedown → rollover → run,
    * with the retracted doc's exact copy and near-dup both re-admitted
    * and a surviving doc's duplicate still rejected. */
  def rollover(st: Stores, spark: SparkSession, root: String,
               name: String): Stores = {
    val next = stores(spark, root, name)
    next.hashes.appendTickAt(1, resolved(st, st.hashes.current().get))
    next.bands.appendTickAt(1, resolved(st, st.bands.current().get))
    next.shingles.appendTickAt(1, resolved(st, st.shingles.current().get))
    next
  }

  /** [[rollover]] for a MULTIMODAL bundle: all five stores' RESOLVED
    * state (shared tombstones baked in) re-seeds as tick 1 of a fresh
    * generation — the restart boundary the mm stream's takedown
    * discipline runs at (DocStreamSpec pins the full mm boundary flow
    * including the quarantine recovery). */
  def rolloverMm(st: MmStores, spark: SparkSession, root: String,
                 name: String): MmStores = {
    val next = mmStores(spark, root, name)
    next.text.hashes.appendTickAt(1,
      resolved(st.text, st.text.hashes.current().get))
    next.text.bands.appendTickAt(1,
      resolved(st.text, st.text.bands.current().get))
    next.text.shingles.appendTickAt(1,
      resolved(st.text, st.text.shingles.current().get))
    next.imgSigs.appendTickAt(1, resolved(st.text, st.imgSigs.current().get))
    next.audSigs.appendTickAt(1, resolved(st.text, st.audSigs.current().get))
    next
  }

  /** Roll an attached quarantine into the same fresh generation as
    * [[rollover]]'s stores: the LIVE quarantine (rows minus resolved
    * ids minus corpus tombstones) re-seeds as tick 1 of a new
    * [[Quarantine]], with an empty resolvedIds base — so the rolled
    * bundle's tick agreement aligns with the rolled stores' (both at
    * tick 1) and a quiesce-point [[readjudicateTick]] recovers
    * stream-rejected docs after a takedown (the streaming quarantine
    * fold's restart-boundary contract). */
  /** [[rollover]] for an attached SEMANTIC leg (r12 advice): the sig
    * store re-seeds — resolved through the OLD generation's tombstones
    * — as tick 1 of a fresh store under the rolled loop's name, so a
    * sem-attached tick after rollover starts from an aligned agreement
    * instead of hitting the `currentUpTo` coverage guard, and every
    * retracted doc's signature rows are physically absent from the
    * rolled state. Parameters (tables/bits/dim/threshold) and the
    * vectors side table carry over unchanged — semantic verdicts stay
    * re-derivable across the boundary, and the carried knob is
    * RE-RECORDED under the new name with [[resizeSemLeg]]'s commit
    * discipline (r14 self-audit: without the params artifact, a
    * restart that reconstructs the rolled leg via [[semLegSized]]
    * would re-size from the live count and serve a width the rolled
    * tick-1 sigs were never derived at — the silent mismatch the
    * recorded-knob rule exists to prevent; sigs land first, the params
    * overwrite is the commit point, and a name whose params are
    * already committed is refused). For a multimodal loop pass
    * `st.text` (the shared tombstone lineage). */
  def rolloverSem(st: Stores, leg: SemLeg, spark: SparkSession,
                  root: String, name: String): SemLeg = {
    val pPath = s"$root/ingest_state/$name/sem_params"
    require(!pathExists(spark, s"$pPath/_SUCCESS"),
      s"rolloverSem requires a FRESH generation name: '$name' already " +
        "carries committed sem_params")
    val next = SemLeg(
      ArtifactStore.ingestState(spark, root, s"$name/sem_sigs"),
      leg.vectors, leg.nTables, leg.bits, leg.dim, leg.simThreshold)
    next.sigs.appendTickAt(1, resolved(st, leg.sigs.current().get))
    import spark.implicits._
    Seq((leg.nTables, leg.bits, leg.dim)).toDF("tables", "bits", "dim")
      .coalesce(1).write.mode("overwrite").parquet(pPath)
    next
  }

  /** [[rollover]] for an attached DECONTAM leg (r12 advice): the
    * doc-side reverse index (`docGrams`) re-seeds through the CORPUS
    * tombstones and the eval-side gram/band/shingle state through the
    * EVAL tombstones — both lineages baked in — as tick 1 of a fresh
    * leg, with the new eval tombstone store empty. Without this a
    * stale docGrams (read via `current()`, unguarded) silently kept
    * pre-rollover rows, so an eval-set addition could retro-catch docs
    * the takedown had just retracted. */
  def rolloverEval(st: Stores, leg: EvalLeg, spark: SparkSession,
                   root: String, name: String): EvalLeg = {
    val next = evalLeg(spark, root, name, leg.n, leg.threshold).copy(
      imgSigs = leg.imgSigs.map(_ =>
        ArtifactStore.ingestState(spark, root, s"$name/eval_img_sigs")),
      audSigs = leg.audSigs.map(_ =>
        ArtifactStore.ingestState(spark, root, s"$name/eval_aud_sigs")),
      maxDist = leg.maxDist, maxBand = leg.maxBand)
    next.docGrams.appendTickAt(1, resolved(st, leg.docGrams.current().get))
    next.grams.appendTickAt(1, resolvedEval(leg, leg.grams.current().get))
    next.bands.appendTickAt(1, resolvedEval(leg, leg.bands.current().get))
    next.shingles.appendTickAt(1,
      resolvedEval(leg, leg.shingles.current().get))
    next.imgSigs.foreach(_.appendTickAt(1,
      resolvedEval(leg, leg.imgSigs.get.current().get)))
    next.audSigs.foreach(_.appendTickAt(1,
      resolvedEval(leg, leg.audSigs.get.current().get)))
    next
  }

  def rolloverQuarantine(st: Stores, quar: Quarantine, spark: SparkSession,
                         root: String, name: String): Quarantine = {
    val next = quarantine(spark, root, name)
    val rows = quar.rows.current().get
    val live = resolved(st,
      quar.resolvedIds.current()
        .fold(rows)(r => rows.join(r.select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")))
    next.rows.appendTickAt(1, live)
    next.resolvedIds.appendTickAt(1, rows.select("doc_id").limit(0))
    next
  }

  /** The tick this run should PRODUCE, with crash recovery: normally
    * every store agrees on maxTick T and the next tick is T+1; after a
    * crash between the per-store writes the stores disagree, and the
    * incomplete tick (the max) must be REDONE — judged against
    * `currentUpTo(t−1)` and rewritten idempotently, so a partial fold
    * can neither self-dup the replayed batch nor leave a store behind
    * (IngestLoopSpec pins the replay).
    *
    * When a BM25 index rides the tick ([[runTickWithRetrieval]]) its
    * tf store participates in the agreement check (r10 advice): a
    * crash AFTER the shingles append but BEFORE the postings append
    * would otherwise leave the three dedup stores agreeing at tick T —
    * the replay would compute T+1, judge the replayed batch against
    * its own tick-T admissions (all dup_exact), and the index would
    * permanently miss tick T's postings. Including the tf store makes
    * the lag visible and tick T is redone across all FOUR stores. */
  private[io] def nextTickOf(done: Seq[Long]): Long = {
    require(done.min >= 1,
      "ingest loop not bootstrapped (every store — including the BM25 " +
        "index / census / ANN / export legs when attached — needs its " +
        "tick-1 base)")
    if (done.distinct.size == 1) done.head + 1 else done.max
  }

  private def nextTick(st: Stores,
                       idx: Option[ArtifactStore.Bm25IncrementalIndex],
                       census: Option[ArtifactStore.GramCensusIncrementalIndex]
                         = None,
                       ann: Option[AnnLeg] = None,
                       export: Option[ExportLeg] = None,
                       mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                       quar: Option[Quarantine] = None,
                       replay: Option[ReplayLeg] = None,
                       sem: Option[SemLeg] = None,
                       eval: Option[EvalLeg] = None,
                       curate: Option[CurateLeg] = None)
      : Long =
    nextTickOf((Seq(st.hashes, st.bands, st.shingles) ++ idx.map(_.tfStore)
      ++ census.map(_.censusStore) ++ ann.map(_.idx.codeStore)
      ++ mix.map(_.mixStore)
      ++ quar.toSeq.flatMap(q => Seq(q.rows, q.resolvedIds))
      ++ replay.map(_.feats) ++ sem.map(_.sigs) ++ eval.map(_.docGrams)
      ++ curate.map(_.census.censusStore))
      .map(_.maxTick) ++ export.map(_.store.maxTick))

  /** The QUOTA leg of a budgeted deployment tick (q130,
    * [[Provenance.q130BudgetedAdmission]]): per-source token budgets
    * derived from the MAINTAINED mixture counts ([[ArtifactStore
    * .MixIncrementalIndex.mix]] — zero recounts; bootstrap the mix
    * store from the corpus and usually ALSO pass it as [[runFullTick]]'s
    * `mix` fold leg so the budgets track admissions and takedowns).
    * Within each source, the tick's novel docs admit in quality-rank
    * order while the running token sum stays inside
    * `budgetFrac × novel_tokens × source_share` — only the under-budget
    * prefix folds back, so a LATER exact copy of an over-budget doc is
    * still admittable (it was never ingested; IngestLoopSpec pins it).
    * Over-budget docs are NOT quarantined: they are rate-limited, not
    * rejected on evidence — a deployment re-enqueues them upstream. */
  final case class QuotaLeg(mix: ArtifactStore.MixIncrementalIndex,
                            budgetFrac: Double =
                              Provenance.DefaultBudgetFrac)

  /** The QUARANTINE of an ingest loop (q131,
    * [[Provenance.q131Readjudication]]): rejected docs are not
    * discarded — a dup verdict is derived from state rows that a later
    * takedown may remove, so rejections are held re-judgeable. `rows`
    * accumulates (doc_id, source, text, verdict) per tick —
    * quarantine is the ONE store that must keep text, because
    * re-judgment re-hashes, re-bands and re-scores it; `resolvedIds`
    * accumulates the doc_ids a [[readjudicateTick]] resolved — docs
    * that escaped the dup gates and reached a post-dup verdict
    * (re-admitted OR quality-rejected; only still-dup docs stay
    * re-judgeable) — the anti-join that removes them from the live
    * quarantine (append-only like every store; ids are arrival-unique,
    * so by-id suppression is exact). BOTH stores append every
    * tick (empty frames when nothing changed), so they participate in
    * the tick agreement and a crash between any pair of appends forces
    * a visible redo. */
  final case class Quarantine(rows: ArtifactStore.IngestStateStore,
                              resolvedIds: ArtifactStore.IngestStateStore)

  def quarantine(spark: SparkSession, root: String,
                 name: String): Quarantine =
    Quarantine(
      ArtifactStore.ingestState(spark, root, s"$name/quar_rows"),
      ArtifactStore.ingestState(spark, root, s"$name/quar_resolved"))

  /** Seed an attached quarantine's tick-1 base (idempotent, the
    * [[bootstrap]] contract): both stores start EMPTY — the corpus was
    * ingested, not rejected — but need their tick-1 directories so the
    * tick agreement's min-tick check holds. */
  def bootstrapQuarantine(quar: Quarantine, corpusDocs: DataFrame): Unit = {
    quar.rows.appendTickAt(1, corpusDocs
      .select(col("doc_id"), col("source"), col("text"),
        lit("").as("verdict")).limit(0))
    quar.resolvedIds.appendTickAt(1, corpusDocs.select("doc_id").limit(0))
  }

  /** The REPLAY leg of a deployment tick (q134,
    * [[Provenance.q134QualityReadjudication]]): each tick persists its
    * NOVEL cohort's 7-double gate features plus the tick-time quality
    * verdict — (doc_id, source, tick, lq, x0..x6) — so any LATER model
    * can re-gate any tick's quality window with zero text reads (the
    * q128 reservoir argument applied to the admission gate). Rows are
    * ~70 bytes/doc of the novel slice only; the store participates in
    * the tick agreement. */
  final case class ReplayLeg(feats: ArtifactStore.IngestStateStore)

  def replayLeg(spark: SparkSession, root: String, name: String): ReplayLeg =
    ReplayLeg(ArtifactStore.ingestState(spark, root, s"$name/gate_feats"))

  /** Tick-1 base for an attached replay leg: EMPTY (the corpus was
    * never gated), idempotent, schema-complete. */
  def bootstrapReplay(leg: ReplayLeg, corpusDocs: DataFrame): Unit =
    leg.feats.appendTickAt(1,
      QualityModel.gateFeatures(corpusDocs)
        .join(corpusDocs.select("doc_id", "source"), "doc_id")
        .withColumn("tick", lit(1L)).withColumn("lq", lit(false))
        .select(Seq(col("doc_id"), col("source"), col("tick"), col("lq")) ++
          (0 until QualityModel.NumW).map(j => col(s"x$j")): _*)
        .limit(0))

  /** The MULTIMODAL quarantine's tick-1 base — the mm row layout
    * additionally carries the doc's 8-byte image/audio signatures
    * ([[runMmTick]]'s quarantine leg), and every tick of one store
    * must share a schema. */
  def bootstrapMmQuarantine(quar: Quarantine, corpusDocs: DataFrame): Unit = {
    quar.rows.appendTickAt(1, corpusDocs
      .select(col("doc_id"), col("source"), col("text"),
        lit(null).cast("long").as("img_sig"),
        lit(null).cast("long").as("aud_sig"),
        lit("").as("verdict")).limit(0))
    quar.resolvedIds.appendTickAt(1, corpusDocs.select("doc_id").limit(0))
  }

  /** The SEMANTIC-DEDUP leg of a deployment tick (q135,
    * [[graft.operators.SemanticGate.q135SemanticAdmission]]) — the
    * verdict precedence extends to exact → fuzzy → SEMANTIC →
    * low_quality: the loop maintains the RP-LSH signature rows
    * (doc_id, tbl, code) of every ingested doc's embedding; each tick
    * flags batch docs that bucket-collide AND cosine-verify against
    * the state ([[graft.operators.SemanticGate.flaggedAgainstState]]),
    * and only admitted docs' signature rows fold back. `vectors` is
    * the (vec_id, embedding) side table keyed by doc_id (the
    * [[AnnLeg]] contract). The hyperplanes are FIXED deterministic
    * functions — no trained artifact, so there is no recluster re-gate
    * for this leg (the [[graft.operators.SemanticGate]] design note):
    * semantic verdicts are purely state-dependent and re-open exactly
    * like exact/fuzzy ones — [[retractTick]] frees a takedown's sig
    * rows through the shared doc-keyed tombstone anti-join, and
    * [[readjudicateTick]] re-judges quarantined `dup_semantic` docs
    * against the surviving state (cosine re-derived from the side
    * table; no payloads). The sig store participates in the tick
    * agreement. SemIngestSpec pins store ≡ live q135, both decisive
    * directions, crash replay, and the quarantine loop. */
  final case class SemLeg(sigs: ArtifactStore.IngestStateStore,
                          vectors: DataFrame,
                          nTables: Int = graft.operators.SemanticGate.DefaultTables,
                          bits: Int = graft.operators.SemanticGate.DefaultBits,
                          dim: Int = graft.operators.SemanticGate.DefaultDim,
                          simThreshold: Double =
                            graft.operators.SemanticGate.DefaultSimThreshold)

  // (sem-leg ops: semLeg/semLegSized/resizeSemLeg/semCanary*/
  // bootstrapSem/semFlags — and eval-leg ops: evalLeg/mmEvalLeg/
  // bootstrapEval/evalUpdate*Tick/compactEval/contamFlags — moved
  // to IngestLegOps.scala, mixed in below; r14 item 6 file hygiene)


  /** The DECONTAMINATION leg of a deployment tick (q136,
    * [[graft.operators.Decontam.q136DecontamTick]]) — the verdict
    * precedence extends to … → CONTAMINATED → low_quality: the loop
    * maintains EVAL-SET state (verbatim 8-gram hashes, the q66 rule,
    * plus the q88 fuzzy band/shingle state — both keyed by the eval
    * item's id) and flags batch docs hitting a LIVE eval item on
    * either channel. `docGrams` is the corpus-side doc-granular gram
    * state (doc_id, h) of every ADMITTED doc — the reverse index that
    * makes an eval-set ADDITION reach backward ([[evalUpdateTick]]'s
    * retro-catch) with zero corpus-text re-reads; it folds per loop
    * tick, participates in the tick agreement, and retracts through
    * the shared corpus tombstones like every doc-keyed store. The
    * eval-side stores have their OWN lineage (an eval update is a
    * quiesce-point operation like a takedown, never a loop tick);
    * withdrawals tombstone eval ids in `tombs` — every eval-state read
    * resolves through it, so a withdrawal takes effect without
    * rewriting any row, and [[readjudicateTick]] with this leg
    * re-judges quarantined `contaminated` docs against the live set
    * (the q131 shape: an eval set is to contamination what state rows
    * are to dup verdicts). DecontamIngestSpec pins store ≡ live q136,
    * both update directions, crash replay, and the quarantine loop. */
  final case class EvalLeg(grams: ArtifactStore.IngestStateStore,
                           bands: ArtifactStore.IngestStateStore,
                           shingles: ArtifactStore.IngestStateStore,
                           tombs: ArtifactStore.IngestStateStore,
                           docGrams: ArtifactStore.IngestStateStore,
                           n: Int = graft.operators.Decontam.DefaultN,
                           threshold: Double = 0.2,
                           // MODALITY channels (q140, r12 verdict item
                           // 6): perceptual signatures of the eval
                           // MEDIA — a held-out eval image/audio clip
                           // reaching the corpus verdicts
                           // `contaminated` like any text hit. Eval-id
                           // keyed, so the shared eval tombstones are
                           // their withdrawal too. None = text-only
                           // (q136's channels).
                           imgSigs: Option[ArtifactStore.IngestStateStore]
                             = None,
                           audSigs: Option[ArtifactStore.IngestStateStore]
                             = None,
                           maxDist: Int = 10, maxBand: Int = 64)


  /** The CURATED FOLD-BACK leg of a deployment tick (q137,
    * [[graft.operators.CurateTick.q137CuratedFoldback]]): admitted
    * docs' text is TRANSFORMED — census-strip (q129's winner rule over
    * the referenced maintained gram census, at ITS granularity) then
    * PII scrub (q78) — before it reaches the SERVING consumers (BM25
    * postings, packed export). Two-column provenance: the dedup stores
    * and the quarantine keep the RAW text's evidence (a later raw copy
    * still rejects; takedowns and re-adjudication see raw), and the
    * census leg keeps folding RAW text (it is the strip-rule source).
    * `census` is usually the SAME index passed as the tick's census
    * leg — the agreement and fold-back handle either case without
    * double-appending. CurateTickSpec pins store report ≡ live q137,
    * the physical export slices carrying the curated hashes, and raw
    * dedup behavior unchanged by the transform. */
  final case class CurateLeg(census: ArtifactStore.GramCensusIncrementalIndex,
                             topN: Int =
                               graft.operators.CurateTick.DefaultTopN)

  /** The ANN SERVING leg of a deployment tick (q124,
    * [[graft.operators.Pq.q124AnnIngestTick]]): the loop additionally
    * maintains an IVF-PQ index over the admitted docs' embeddings —
    * `vectors` is the (vec_id, embedding) side table keyed by doc_id,
    * semi-joined per tick on the admitted set; codes encode under the
    * index's CURRENT serving artifacts ([[ArtifactStore
    * .IvfPqIncrementalIndex.servingArtifacts]] — post-recluster
    * generations carry their own) falling back to the bootstrap
    * `cents`/`rcb` the caller trained on the ingested corpus. The code
    * store participates in the tick agreement, so a crash between any
    * pair of per-store appends (including after the census but before
    * the codes) redoes the whole tick idempotently. A recluster
    * between loop ticks must pass `baseTick = <current loop tick>` so
    * the rebuilt generation re-enters the agreement at the loop's tick
    * instead of resetting to 1 (AnnIngestSpec pins both). */
  final case class AnnLeg(idx: ArtifactStore.IvfPqIncrementalIndex,
                          vectors: DataFrame,
                          cents: DataFrame, rcb: DataFrame)

  /** RECALL DRIFT CANARY for an ANN leg (q120's trigger form — the
    * [[semCanaryTick]] discipline applied to the retrieval index): at
    * a quiesce point, measure frozen-vs-retrained IVFADC recall on the
    * drift-exposed split of the index's LIVE vectors
    * ([[graft.operators.Pq.annRecallDecision]]) and, when retraining
    * recovers at least `minGainHits` ground-truth hits, run the q122
    * response — [[ArtifactStore.IvfPqIncrementalIndex.recluster]] into
    * a fresh generation under the retrained artifacts (generation-swap,
    * marker-last crash discipline), re-entering the tick agreement at
    * `baseTick`. Returns the serving leg: artifacts swapped to the
    * retrained tables when the recluster ran, the given leg otherwise.
    * Unlike the ~1 s sem census this costs a bounded retrain +
    * canary-sized ground truth (the q120 scale shape) — still a
    * quiesce-point cost, not a per-tick one. */
  def annCanaryTick(leg: AnnLeg, baseTick: Long,
                    nQueries: Int = 32,
                    kTop: Int = graft.operators.Pq.DefaultTopK,
                    minGainHits: Long = 1L): AnnLeg = {
    val live = leg.vectors.join(
      leg.idx.codes().select("vec_id").distinct(), Seq("vec_id"),
      "left_semi")
    val (resize, cFr, rcbFr) = graft.operators.Pq.annRecallDecision(
      live, nQueries = nQueries, kTop = kTop, minGainHits = minGainHits)
    if (!resize) leg
    else {
      leg.idx.recluster(live, cFr, rcbFr, baseTick = baseTick)
      leg.copy(cents = cFr, rcb = rcbFr)
    }
  }

  /** The EXPORT leg of a deployment tick (q125,
    * [[graft.operators.Packing.q125ExportRetraction]]): the loop
    * additionally maintains the physical training shards — each tick's
    * ADMITTED docs pack tick-locally under the FROZEN merge list `ms`
    * (retraining the tokenizer is the q119 gated choice, never an
    * implicit per-tick side effect) and land as their own export epoch
    * ([[ArtifactStore.PackedExportStore]]). The export participates in
    * the tick agreement via its maxTick, so a crash between any other
    * append and the export's makes the lag visible and the whole tick
    * redoes; the export side of a REDONE tick writes identical slices
    * as the tick's next revision (complete-or-invisible), so replays
    * are idempotent in effect. [[retractTick]]'s export leg re-packs
    * affected epochs from stored counts — the takedown reaches the
    * shards a training job actually streams. */
  final case class ExportLeg(store: ArtifactStore.PackedExportStore,
                             ms: Seq[String])

  /** CERTIFY-AT-QUIESCE hook for the export leg (r13 verdict item 1):
    * seal the store under the LOOP'S OWN tombstone state — the q132
    * liveness input is the corpus takedown set the loop already
    * maintains, so certification needs nothing the deployment doesn't
    * have. Run at quiesce points after the tick(s)/takedowns/
    * compactions that advanced the store; until sealed, the new
    * epochs/revisions are refused by [[ArtifactStore.PackedExportStore
    * .servedSlices]] (the training read path) and by
    * [[ArtifactStore.ConsumptionStore.record]]'s structural overload —
    * the gate binds at the boundary, not at the consumer's discretion.
    * `docSources` is the narrow (doc_id, source) relation for the mix
    * check. STREAMS inherit the same seam: a stream-folded export is
    * sealed at the stream's quiesce/rollover boundary with the same
    * call (the stores' tombstone lineage is shared — for a multimodal
    * loop pass `st.text`), after which the roll → seal → record
    * recipe makes streaming consumption auditable end to end
    * (DocStreamSpec pins the flow). ORDERING caveat for manual
    * composition (r15 advice): this reads `st.tombs` LIVE — a
    * [[compactIfNeeded]] run in the same quiesce resets it, so seal
    * BEFORE compacting, or use [[quiesce]], whose kernel captures
    * the tombstone set at bundle entry and is immune to the
    * ordering. */
  def sealExport(st: Stores, leg: ExportLeg, docSources: DataFrame,
                 minFillMicro: Long =
                   graft.operators.Packing.DefaultMinFillMicro,
                 mixTolMicros: Long =
                   graft.operators.Packing.DefaultMixTolMicros)
      : DataFrame = {
    val tombs = st.tombs.current().map(_.select("doc_id"))
      .getOrElse(docSources.select("doc_id").limit(0))
    leg.store.seal(docSources, tombs, minFillMicro, mixTolMicros)
  }

  /** Judge one batch against the accumulated state, fold the admitted
    * docs' increments back, and return the per-source q103 report
    * (n_batch / n_dup_exact / n_dup_fuzzy / n_low_quality / n_new).
    * `w` is the frozen quality model — a deployment retrains between
    * ticks (the q104 monitoring read), never within one.
    *
    * Crash discipline (review finding, closed): the tick number is
    * fixed up front ([[nextTick]]), the state is read AS OF the
    * previous tick (`currentUpTo` — a half-written fold from a crashed
    * run of THIS tick is invisible), and all fold-back writes are
    * tick-keyed overwrites — so re-running a crashed tick reproduces
    * identical verdicts and completes the missing store writes instead
    * of judging admitted docs against their own half-folded hashes. */
  def runTick(st: Stores, batchDocs: DataFrame, w: Seq[Double],
              threshold: Double = 0.2, lowFrac: Double = 0.25,
              quar: Option[Quarantine] = None,
              replay: Option[ReplayLeg] = None,
              sem: Option[SemLeg] = None,
              eval: Option[EvalLeg] = None,
              curate: Option[CurateLeg] = None): DataFrame =
    runTickImpl(st, None, batchDocs, w, threshold, lowFrac, quar = quar,
      replay = replay, sem = sem, eval = eval, curate = curate)

  private def runTickImpl(st: Stores,
                          idx: Option[ArtifactStore.Bm25IncrementalIndex],
                          batchDocs: DataFrame, w: Seq[Double],
                          threshold: Double, lowFrac: Double,
                          census: Option[
                            ArtifactStore.GramCensusIncrementalIndex] = None,
                          ann: Option[AnnLeg] = None,
                          export: Option[ExportLeg] = None,
                          mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                          quota: Option[QuotaLeg] = None,
                          quar: Option[Quarantine] = None,
                          replay: Option[ReplayLeg] = None,
                          sem: Option[SemLeg] = None,
                          eval: Option[EvalLeg] = None,
                          curate: Option[CurateLeg] = None)
      : DataFrame = {
    val t = nextTick(st, idx, census, ann, export, mix, quar, replay, sem,
      eval, curate)
    // every state read resolves through the tombstone store: retracted
    // docs' rows are invisible whether or not a compaction folded them
    val state = resolved(st, st.hashes.currentUpTo(t - 1).getOrElse(
        sys.error("ingest loop not bootstrapped: hash state is empty")))
      .select("ch").distinct()
    val fuzzy = Fuzzy.lshPairsAgainstState(
        resolved(st, st.bands.currentUpTo(t - 1).get),
        resolved(st, st.shingles.currentUpTo(t - 1).get),
        batchDocs, threshold)
      .select(col("eval_id").as("fid")).distinct()
    // the q103/q106 kernel — or, with extra evidence legs attached
    // (q135 semantic, q136 contamination), the extended precedence
    // exact → fuzzy → semantic → contaminated → quality; the returned
    // frame is checkpointed, so the fold-back writes and the report
    // never re-run the chain
    val extras: Seq[(String, DataFrame)] =
      sem.map(leg => ("sid",
        semFlags(st, leg, t, batchDocs.select("doc_id")))).toSeq ++
      eval.map(leg => ("cid", contamFlags(leg, batchDocs))).toSeq
    val extraNames = Map("sid" -> "n_dup_semantic",
      "cid" -> "n_contaminated")
    val v =
      if (extras.isEmpty)
        Provenance.gatedTickFrame(batchDocs, state, fuzzy, w, lowFrac)
      else
        Provenance.gatedTickFrameWith(batchDocs, state, fuzzy, extras,
          w, lowFrac)
    // the admitted set: every novel doc — or, on a BUDGETED tick
    // (q130), the quality-ranked under-budget prefix per source, with
    // budgets derived from the maintained mix counts
    val (admIds, report) = quota match {
      case None =>
        (v.filter(col("lq") === false).select("doc_id"),
          if (extras.isEmpty) Provenance.gatedTickReport(v)
          else Provenance.gatedTickReportWith(v,
            extras.map { case (c, _) => (c, extraNames(c)) }))
      case Some(q) =>
        val srcCounts = q.mix.mix()
          .select(col("source"), col("n_docs").as("n_src"))
        val bf = Provenance.budgetedFrame(v, batchDocs, srcCounts,
          q.budgetFrac)
        val rep = Provenance.budgetedTickReport(v, bf, srcCounts,
          q.budgetFrac)
        // a budgeted tick WITH extra evidence legs: splice the class
        // counts into the q130 columns (the budget algebra itself is
        // class-agnostic — it ranks the post-gate novel set)
        val rep2 = if (extras.isEmpty) rep else {
          var prev: org.apache.spark.sql.Column =
            col("ch").isNull && col("fid").isNull
          val clsAggs = extras.map { case (c, _) =>
            val e = count(when(prev, col(c))).as(extraNames(c))
            prev = prev && col(c).isNull
            e
          }
          val cls = v.groupBy("source").agg(clsAggs.head, clsAggs.tail: _*)
          rep.join(cls, Seq("source"), "left")
            .select((Seq(col("source"), col("n_batch"),
              col("n_dup_exact"), col("n_dup_fuzzy")) ++
              extras.map { case (c, _) => col(extraNames(c)) } ++
              Seq(col("n_low_quality"), col("n_novel"),
                col("novel_tokens"), col("budget_tokens"),
                col("n_admitted"), col("admitted_tokens"),
                col("n_over_budget"))): _*)
            .orderBy("source")
        }
        (bf.filter(col("admitted")).select("doc_id"), rep2)
    }
    val admDocs = batchDocs.join(admIds, Seq("doc_id"), "left_semi")
    // CURATED FOLD-BACK (q137): the serving consumers receive the
    // transformed text; the dedup stores below keep folding RAW
    // evidence (two-column provenance). Severed: read by the idx and
    // export appends AND the audit aggregate.
    val curRows = curate.map { cl =>
      graft.operators.CurateTick.curatedDocs(admDocs,
        cl.census.censusStore.currentUpTo(t - 1).getOrElse(
          sys.error("curate leg not bootstrapped: no census base")),
        batchDocs, cl.census.k, cl.topN).localCheckpoint()
    }
    val servedDocs = curRows.map(_.select("doc_id", "source", "text"))
      .getOrElse(admDocs)
    st.hashes.appendTickAt(t, v.join(admIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("h").as("ch")))
    st.bands.appendTickAt(t, Fuzzy.corpusBandState(admDocs))
    st.shingles.appendTickAt(t, Fuzzy.corpusShingleHashes(admDocs))
    idx.foreach(_.appendDocsAt(t, servedDocs))
    census.foreach(_.appendDocsAt(t, admDocs))
    // a curate leg whose census is NOT the tick's census leg still
    // folds the RAW admitted increment (same object → no double fold)
    curate.filter(cl => !census.contains(cl.census))
      .foreach(_.census.appendDocsAt(t, admDocs))
    ann.foreach { leg =>
      val (c, r) = leg.idx.servingArtifacts().getOrElse((leg.cents, leg.rcb))
      leg.idx.appendVectorsAt(t, leg.vectors.join(
        admIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        c, r)
    }
    // SEMANTIC leg (q135): admitted docs' signature rows — the state
    // the next tick's semantic flags probe
    sem.foreach(leg => leg.sigs.appendTickAt(t,
      graft.operators.SemanticGate.sigRowsOf(leg.vectors, admIds,
        leg.nTables, leg.bits, leg.dim)))
    // DECONTAM leg (q136): admitted docs' gram rows — the reverse index
    // an eval-set addition retro-catches from
    eval.foreach(leg => leg.docGrams.appendTickAt(t,
      graft.operators.Contamination.grams(admDocs, leg.n)))
    // EXPORT leg: admitted docs pack as this tick's epoch under the
    // frozen merges — the CURATED form when a curate leg is attached
    export.foreach(leg => leg.store.appendDocsAt(t, servedDocs, leg.ms))
    // MIX leg (q127's state): per-source admitted counts, additive
    mix.foreach(_.appendDocsAt(t, admDocs))
    // QUARANTINE leg (q131): evidence/quality rejections are held
    // re-judgeable; over-budget docs are NOT quarantined (rate-limited,
    // not rejected on evidence — see QuotaLeg). resolvedIds appends an
    // empty frame so both quarantine stores stay in the tick agreement.
    quar.foreach { qs =>
      val sid = if (sem.isEmpty) lit(null).cast("long") else col("sid")
      val cid = if (eval.isEmpty) lit(null).cast("long") else col("cid")
      val rej = v.filter(col("ch").isNotNull || col("fid").isNotNull ||
          sid.isNotNull || cid.isNotNull || col("lq") === true)
        .withColumn("verdict",
          when(col("ch").isNotNull, lit("dup_exact"))
            .when(col("fid").isNotNull, lit("dup_fuzzy"))
            .when(sid.isNotNull, lit("dup_semantic"))
            .when(cid.isNotNull, lit("contaminated"))
            .otherwise(lit("low_quality")))
        .join(batchDocs.select("doc_id", "text"), "doc_id")
        .select("doc_id", "source", "text", "verdict")
      qs.rows.appendTickAt(t, rej)
      qs.resolvedIds.appendTickAt(t, admIds.limit(0))
    }
    // REPLAY leg (q134): the tick's novel cohort's gate features + the
    // tick-time quality verdict — what a later model re-gates (with a
    // semantic leg, novel = no evidence of ANY dup class: lq non-null)
    replay.foreach { leg =>
      val nov = v.filter(col("lq").isNotNull)
        .select(col("doc_id"), col("source"), col("lq"))
      leg.feats.appendTickAt(t, nov
        .join(QualityModel.gateFeatures(batchDocs), "doc_id")
        .withColumn("tick", lit(t))
        .select(Seq(col("doc_id"), col("source"), col("tick"), col("lq")) ++
          (0 until QualityModel.NumW).map(j => col(s"x$j")): _*))
    }
    // with a curate leg the report carries the q137 rewrite audit —
    // what was stripped/redacted, and the curated content signature
    // the export now serves
    curRows match {
      case None => report
      case Some(cr) =>
        val audit = cr
          .select(col("source"), col("n_tokens"), col("n_removed"),
            col("chars_redacted"),
            Provenance.contentHash60(col("text")).as("chc"))
          .groupBy("source")
          .agg(sum("n_tokens").as("tokens_raw"),
            sum("n_removed").as("tokens_removed"),
            sum("chars_redacted").as("chars_redacted"),
            expr("bit_xor(chc)").as("exact_curated_sig"))
        report.join(audit, Seq("source"), "left")
          .withColumn("tokens_raw", coalesce(col("tokens_raw"), lit(0L)))
          .withColumn("tokens_removed",
            coalesce(col("tokens_removed"), lit(0L)))
          .withColumn("chars_redacted",
            coalesce(col("chars_redacted"), lit(0L)))
          .withColumn("exact_curated_sig",
            coalesce(col("exact_curated_sig"), lit(0L)))
          .orderBy("source")
    }
  }

  /** File-count-triggered compaction (the production trigger the r9
    * verdict names): when any store's backing data-file count crosses
    * `maxDataFiles`, fold ALL three into their current generation —
    * applying the tombstone anti-join while folding, so retracted docs'
    * rows physically leave the state. The tombstone store is cleared
    * only once every data store folded (a skipped single-gen fold keeps
    * it; the read-path anti-join makes either outcome verdict-invariant,
    * which is also why any crash ordering here is safe — spec-pinned).
    * Returns whether compaction ran. Run at quiesce points only (see
    * `IngestStateStore.currentUpTo`). */
  def compactIfNeeded(st: Stores, maxDataFiles: Long = 64,
                      sem: Option[SemLeg] = None,
                      eval: Option[EvalLeg] = None,
                      quar: Option[Quarantine] = None,
                      replay: Option[ReplayLeg] = None): Boolean = {
    // an attached semantic leg's sig store (and a decontam leg's
    // docGrams) resolves through st.tombs like the three dedup stores,
    // so it MUST fold in the same pass — clearing the tombstones after
    // folding only three stores would resurface retracted rows at the
    // next flag read. The QUARANTINE stores and a replay leg's feats
    // are in the same lineage (r16 self-audit — the same resurface
    // class): readjudicateTick/regateTick read them through
    // `resolved`, so folding the dedup stores and resetting without
    // them would resurface a taken-down doc's quarantine/feats rows —
    // and a later re-adjudication could RE-ADMIT a doc the takedown
    // named (its dup partner left the state in the same takedown).
    // (The eval-SIDE stores fold via compactEval — their tombstones
    // are eval ids, a separate lineage.)
    val all = Seq(st.hashes, st.bands, st.shingles) ++ sem.map(_.sigs) ++
      eval.map(_.docGrams) ++
      quar.toSeq.flatMap(q => Seq(q.rows, q.resolvedIds)) ++
      replay.map(_.feats)
    val need = all.exists(_.dataFileCount > maxDataFiles)
    if (need) {
      val folded = all.map(_.compactWith(df => resolved(st, df)))
      if (st.tombs.current().isDefined && folded.forall(_ > 0))
        st.tombs.reset()
    }
    need
  }

  /** What [[quiesce]] did: the compaction flags (loop lineage /
    * eval lineage), the SERVING legs the deployment keeps (fresh
    * generations when a canary resized / reclustered, the given legs
    * otherwise), the export's re-seal certificate, and the bytes the
    * gc step freed. */
  final case class QuiesceResult(compacted: Boolean,
                                 sem: Option[SemLeg],
                                 semResized: Boolean,
                                 ann: Option[AnnLeg],
                                 annReclustered: Boolean,
                                 cert: Option[DataFrame],
                                 evalCompacted: Boolean = false,
                                 gcBytes: Long = 0L)

  /** THE QUIESCE COMPOSE-POINT (r14 verdict item 3): one call a
    * deployment makes between ticks that runs the whole maintenance
    * bundle, so drift detection is STRUCTURAL — attached to the
    * quiesce point itself, not to the caller remembering each canary
    * (the same move [[ArtifactStore.PackedExportStore.seal]] made for
    * certification: a deployment that grows 2×+ past its bootstrap
    * sizing resizes because it quiesces, not because a test or an
    * operator wired the canary). Runs, in order:
    *
    *  1. [[compactIfNeeded]] — loop-lineage store folds + the shared
    *     tombstone reset (an attached sem leg's sigs, an eval leg's
    *     docGrams, the quarantine stores, and a replay leg's feats
    *     fold in this pass — they all resolve through the SHARED
    *     corpus tombstones, so a deployment that re-adjudicates or
    *     re-gates MUST attach its quarantine/replay here or a
    *     taken-down doc's rows resurface after the reset);
    *  2. [[IngestLegOps.compactEvalIfNeeded]] when an eval leg is
    *     attached — the EVAL-side lineage (grams/bands/shingles +
    *     modality sigs, withdrawals via the eval tombstones) folds
    *     under the same file-count trigger (r15 advice: the bundle
    *     previously never folded eval withdrawals, while its scaladoc
    *     claimed otherwise) — and so do the CONSUMER indexes (r16
    *     self-audit, the completion of the same symmetry): an
    *     attached BM25 posting index / gram census / domain mix / ANN
    *     code store compacts under the trigger via its own
    *     `compact()` (each carries its OWN retraction lineage — BM25
    *     and ANN fold their private tombstones, census/mix are
    *     subtraction-based), so a full runFullTick-shaped deployment
    *     gets every maintained store's fold from the one bundle call;
    *  3. [[semCanaryTick]] when a sem leg is attached — the ~1 s
    *     occupancy census (q141), resizing into `semNextName`'s
    *     generation at the occupancy width when drifted;
    *  4. [[annCanaryTick]] when an ANN leg is attached AND
    *     `annBaseTick` is set — the q120 recall canary, reclustering
    *     under retrained artifacts when retraining recovers hits
    *     (opt-in per quiesce via `annBaseTick`: unlike the census it
    *     costs a bounded retrain, so a deployment states the tick the
    *     rebuilt generation re-enters the agreement at);
    *  5. gc (opt-out via `gcStores = false`) — every attached store's
    *     `gc()`: the loop stores, the sem/eval legs' stores, the
    *     quarantine/replay stores, the consumer indexes (BM25 /
    *     census / mix), the ANN index, the model store, and the
    *     export store shed crash leftovers AND
    *     whatever steps 1–4 just shadowed (folded generations,
    *     superseded recluster generations, stale revisions). Runs
    *     after the canaries so a bundle-triggered resize/recluster is
    *     collected in the same quiesce, and before the seal so the
    *     certificate still lands LAST (r15 verdict item 3: collection
    *     was caller-discipline, the exact argument that put the
    *     canaries in the bundle);
    *  6. [[sealExport]] when an export leg is attached — LAST, so the
    *     recorded certificate covers whatever state the bundle left.
    *     The seal's liveness input is the tombstone set CAPTURED AT
    *     BUNDLE ENTRY (r15 advice): step 1's fold resets the shared
    *     tombstone store, and sealing from the post-reset (empty)
    *     tombs would certify 'serve' for an export that still carries
    *     a retracted doc (a takedown that ran without the export leg
    *     attached) — the pre-compaction capture catches exactly that.
    *
    * Returns the serving legs; the deployment keeps what comes back
    * (the [[semCanaryTick]] contract, now bundle-wide). */
  def quiesce(st: Stores, spark: SparkSession, root: String,
              sem: Option[SemLeg] = None,
              semNextName: Option[String] = None,
              ann: Option[AnnLeg] = None,
              annBaseTick: Option[Long] = None,
              annMinGainHits: Long = 1L,
              eval: Option[EvalLeg] = None,
              export: Option[ExportLeg] = None,
              docSources: Option[DataFrame] = None,
              quar: Option[Quarantine] = None,
              replay: Option[ReplayLeg] = None,
              idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
              census: Option[ArtifactStore.GramCensusIncrementalIndex]
                = None,
              mix: Option[ArtifactStore.MixIncrementalIndex] = None,
              model: Option[ArtifactStore.ModelStore] = None,
              maxDataFiles: Long = 64,
              minFillMicro: Long =
                graft.operators.Packing.DefaultMinFillMicro,
              mixTolMicros: Long =
                graft.operators.Packing.DefaultMixTolMicros,
              gcStores: Boolean = true)
      : QuiesceResult =
    quiesceImpl("quiesce", st,
      () => compactIfNeeded(st, maxDataFiles, sem, eval, quar, replay),
      Seq(st.hashes, st.bands, st.shingles, st.tombs),
      spark, root, sem, semNextName, ann, annBaseTick, annMinGainHits,
      eval, export, docSources, quar, replay, idx, census, mix, model,
      maxDataFiles, minFillMicro, mixTolMicros, gcStores)

  /** [[quiesce]] for a MULTIMODAL deployment (the r15 self-audit
    * twin, now sharing ONE kernel — r15 verdict item 2: the two ~40
    * line bundle bodies had already drifted into copies, the
    * codebase's recurring defect class): identical bundle, except the
    * compaction step is [[compactMmIfNeeded]] — the image/audio sig
    * stores resolve through the SHARED text tombstones, so they must
    * fold in the same pass before those tombstones reset (folding only
    * the text stores and resetting would resurface retracted mm rows
    * at the next flag read) — and the gc step covers the sig stores
    * too. Everything else runs on the `st.text` lineage, exactly as
    * [[sealExport]]'s mm contract states. */
  def quiesceMm(st: MmStores, spark: SparkSession, root: String,
                sem: Option[SemLeg] = None,
                semNextName: Option[String] = None,
                ann: Option[AnnLeg] = None,
                annBaseTick: Option[Long] = None,
                annMinGainHits: Long = 1L,
                eval: Option[EvalLeg] = None,
                export: Option[ExportLeg] = None,
                docSources: Option[DataFrame] = None,
                quar: Option[Quarantine] = None,
                replay: Option[ReplayLeg] = None,
                idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                census: Option[ArtifactStore.GramCensusIncrementalIndex]
                  = None,
                mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                model: Option[ArtifactStore.ModelStore] = None,
                maxDataFiles: Long = 64,
                minFillMicro: Long =
                  graft.operators.Packing.DefaultMinFillMicro,
                mixTolMicros: Long =
                  graft.operators.Packing.DefaultMixTolMicros,
                gcStores: Boolean = true)
      : QuiesceResult =
    quiesceImpl("quiesceMm", st.text,
      () => compactMmIfNeeded(st, maxDataFiles, sem, eval, quar, replay),
      st.all :+ st.text.tombs,
      spark, root, sem, semNextName, ann, annBaseTick, annMinGainHits,
      eval, export, docSources, quar, replay, idx, census, mix, model,
      maxDataFiles, minFillMicro, mixTolMicros, gcStores)

  /** The ONE bundle kernel both compose points delegate to (the
    * [[runTickWithRetrieval]] precedent): `text` is the lineage the
    * canaries/seal run on, `compactStep` the variant's compaction,
    * `gcStateStores` the variant's full ingest-store set (including
    * the tombstone store — its folded generations collect like any
    * other's). Step order and the entry-time tombstone capture are
    * documented on [[quiesce]]. */
  private def quiesceImpl(what: String, text: Stores,
                          compactStep: () => Boolean,
                          gcStateStores: Seq[ArtifactStore.IngestStateStore],
                          spark: SparkSession, root: String,
                          sem: Option[SemLeg],
                          semNextName: Option[String],
                          ann: Option[AnnLeg],
                          annBaseTick: Option[Long],
                          annMinGainHits: Long,
                          eval: Option[EvalLeg],
                          export: Option[ExportLeg],
                          docSources: Option[DataFrame],
                          quar: Option[Quarantine],
                          replay: Option[ReplayLeg],
                          idx: Option[ArtifactStore.Bm25IncrementalIndex],
                          census: Option[
                            ArtifactStore.GramCensusIncrementalIndex],
                          mix: Option[ArtifactStore.MixIncrementalIndex],
                          model: Option[ArtifactStore.ModelStore],
                          maxDataFiles: Long,
                          minFillMicro: Long,
                          mixTolMicros: Long,
                          gcStores: Boolean): QuiesceResult = {
    require(sem.isEmpty || semNextName.isDefined,
      s"$what with a sem leg needs semNextName — the fresh generation " +
        "name a canary-triggered resize lands under (resizeSemLeg " +
        "refuses a committed name, so pass a new one per resize)")
    require(export.isEmpty || docSources.isDefined,
      s"$what with an export leg needs docSources — the (doc_id, " +
        "source) relation the seal's mix certificate reads")
    // the seal's liveness input, captured BEFORE the fold can reset
    // the shared tombstone store (r15 advice — see step 6 above);
    // localCheckpoint: the frame must survive the reset's file deletes
    val preTombs = export.flatMap(_ => text.tombs.current()
      .map(_.select("doc_id").localCheckpoint()))
    val compacted = compactStep()
    val evalCompacted = eval.exists(l =>
      compactEvalIfNeeded(l, maxDataFiles))
    // consumer-index folds under the same trigger (step 2 scaladoc):
    // each index's own compact() applies its own retraction lineage
    idx.filter(_.tfStore.dataFileCount > maxDataFiles)
      .foreach(_.compact())
    census.filter(_.censusStore.dataFileCount > maxDataFiles)
      .foreach(_.compact())
    mix.filter(_.mixStore.dataFileCount > maxDataFiles)
      .foreach(_.compact())
    ann.filter(_.idx.codeStore.dataFileCount > maxDataFiles)
      .foreach(_.idx.compact())
    val semServed = sem.map(l =>
      semCanaryTick(text, l, spark, root, semNextName.get))
    val semResized = sem.zip(semServed).exists { case (a, b) => a ne b }
    val annServed = (ann, annBaseTick) match {
      case (Some(l), Some(bt)) =>
        Some(annCanaryTick(l, bt, minGainHits = annMinGainHits))
      case _ => ann
    }
    val annReclustered = ann.zip(annServed).exists { case (a, b) => a ne b }
    val gcBytes =
      if (!gcStores) 0L
      else {
        val stateStores = gcStateStores ++ sem.map(_.sigs) ++
          eval.toSeq.flatMap(l => Seq(l.grams, l.bands, l.shingles,
            l.tombs, l.docGrams) ++ l.imgSigs ++ l.audSigs) ++
          quar.toSeq.flatMap(q => Seq(q.rows, q.resolvedIds)) ++
          replay.map(_.feats) ++
          idx.toSeq.flatMap(i => Seq(i.tfStore, i.tombStore)) ++
          census.map(_.censusStore) ++ mix.map(_.mixStore)
        stateStores.map(_.gc()).sum +
          ann.map(_.idx.gc()).getOrElse(0L) +
          export.map(_.store.gc()).getOrElse(0L) +
          model.map(_.gc()).getOrElse(0L)
      }
    val cert = export.map { leg =>
      val tombs = preTombs.getOrElse(
        docSources.get.select("doc_id").limit(0))
      leg.store.seal(docSources.get, tombs, minFillMicro, mixTolMicros)
    }
    QuiesceResult(compacted, semServed, semResized,
      annServed, annReclustered, cert, evalCompacted, gcBytes)
  }

  /** The ingest tick of a deployment that ALSO serves retrieval — the
    * r9 verdict's "hit by every ingest tick on a deployment that also
    * serves retrieval", closed: one [[runTick]] whose ADMITTED docs
    * additionally append their postings to the incremental BM25 index
    * ([[ArtifactStore.Bm25IncrementalIndex]]) — the admitted set is
    * derived once from the tick's checkpointed verdict frame, so dedup
    * state and retrieval postings can never disagree about what was
    * ingested, and only admitted (novel) text is ever tokenized
    * (IngestLoopSpec pins the served ranking ≡ a full rebuild over
    * base ∪ all admissions, and reconciles the index's doc count with
    * the admission reports). One shared kernel with [[runTick]]
    * (review finding: the two bodies had drifted into copies) — the
    * postings append is tick-keyed like every other fold, so a crashed
    * tick replays idempotently across all FOUR stores. */
  def runTickWithRetrieval(st: Stores,
                           idx: ArtifactStore.Bm25IncrementalIndex,
                           batchDocs: DataFrame, w: Seq[Double],
                           threshold: Double = 0.2,
                           lowFrac: Double = 0.25): DataFrame =
    runTickImpl(st, Some(idx), batchDocs, w, threshold, lowFrac)

  /** The FULL deployment tick — every maintained state family fed from
    * the one checkpointed verdict frame: the three dedup stores, the
    * BM25 postings ([[runTickWithRetrieval]]'s leg), and the curation
    * gram census ([[ArtifactStore.GramCensusIncrementalIndex]] —
    * q121's state), so a deployment that deduplicates, serves
    * retrieval, AND curates per-tick maintains all five stores in one
    * pass: the admitted set is derived once, admitted text is
    * tokenized once per consumer seam, and no store can disagree about
    * what was ingested. The census store participates in the tick
    * agreement, so a crash between ANY pair of appends (including
    * after the postings but before the census) makes the lag visible
    * and the whole tick is redone idempotently (IngestLoopSpec pins
    * the five-store replay). Retraction composes: [[retractTick]]'s
    * census leg subtracts what this tick's census appends added. With
    * an [[AnnLeg]] the tick feeds the SIXTH store too — the served
    * IVF-PQ codes (q124's deployment form; AnnIngestSpec pins the
    * six-store agreement, the recluster tick alignment, and the ANN
    * retraction leg). With an [[ExportLeg]] the admitted docs
    * additionally pack as this tick's export epoch — the SEVENTH
    * maintained family, the physical shards a training job streams
    * (q125; ExportStoreSpec + IngestLoopSpec pin the leg). */
  def runFullTick(st: Stores,
                  idx: ArtifactStore.Bm25IncrementalIndex,
                  census: ArtifactStore.GramCensusIncrementalIndex,
                  batchDocs: DataFrame, w: Seq[Double],
                  threshold: Double = 0.2,
                  lowFrac: Double = 0.25,
                  ann: Option[AnnLeg] = None,
                  export: Option[ExportLeg] = None,
                  mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                  quota: Option[QuotaLeg] = None,
                  quar: Option[Quarantine] = None,
                  sem: Option[SemLeg] = None,
                  eval: Option[EvalLeg] = None,
                  curate: Option[CurateLeg] = None)
      : DataFrame =
    runTickImpl(st, Some(idx), batchDocs, w, threshold, lowFrac,
      census = Some(census), ann = ann, export = export, mix = mix,
      quota = quota, quar = quar, sem = sem, eval = eval,
      curate = curate)

  /** One BUDGETED admission tick — the deployment form of
    * [[Provenance.q130BudgetedAdmission]]: the q103 gate runs
    * unchanged, then each source's novel docs admit in quality-rank
    * order under the [[QuotaLeg]] token budgets; ONLY the under-budget
    * prefix folds back into the state (and any consumer legs), and the
    * report carries the q130 accounting columns. Same crash/replay
    * discipline as [[runTick]]. */
  def runBudgetedTick(st: Stores, batchDocs: DataFrame, w: Seq[Double],
                      quota: QuotaLeg,
                      threshold: Double = 0.2, lowFrac: Double = 0.25,
                      idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                      census: Option[
                        ArtifactStore.GramCensusIncrementalIndex] = None,
                      ann: Option[AnnLeg] = None,
                      export: Option[ExportLeg] = None,
                      mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                      quar: Option[Quarantine] = None,
                      replay: Option[ReplayLeg] = None,
                      sem: Option[SemLeg] = None,
                      eval: Option[EvalLeg] = None,
                      curate: Option[CurateLeg] = None): DataFrame =
    runTickImpl(st, idx, batchDocs, w, threshold, lowFrac,
      census = census, ann = ann, export = export, mix = mix,
      quota = Some(quota), quar = quar, replay = replay, sem = sem,
      eval = eval, curate = curate)

  /** RE-ADJUDICATE the quarantine — the deployment form of
    * [[Provenance.q131Readjudication]], run after a [[retractTick]]
    * (or any state change) at a quiesce point: the live quarantine's
    * DUP-CLASS rows (exact/fuzzy — evidence-dependent verdicts;
    * low-quality rows re-enter via the model loop — [[regateTick]],
    * q134 — not this one)
    * re-judge against the CURRENT state under the frozen model and the
    * full gate discipline, and docs that now pass fold back into every
    * state store and consumer leg like any admission. The
    * re-adjudication is itself a tick in the store agreement: all
    * writes are tick-keyed overwrites, the state is read as of the
    * previous tick, and `resolvedIds` records the re-admitted ids (the
    * anti-join that removes them from the live quarantine) — so a
    * crash between any pair of appends redoes the tick with identical
    * verdicts. Quarantine reads resolve through the shared tombstone
    * store too: a doc taken down WHILE quarantined never re-admits.
    *
    * Returns the q131 report (per source, original × re-adjudicated
    * verdict counts). ReadjudicationSpec pins store form ≡ the live
    * q131, the no-takedown control (nothing re-admits), replay
    * idempotence, and the fold-back (a later duplicate of a re-admitted
    * doc is rejected).
    *
    * An attached [[ReplayLeg]] advances with this tick too (r11 advice:
    * without it, a loop running ticks with both legs would leave feats
    * one tick behind, and the NEXT replay-attached tick's agreement
    * would resolve to this tick and silently overwrite it — the same
    * class as the takedown-tick bug): the quality-windowed cohort's
    * gate features append at `t` with their re-adjudication-time
    * verdicts, which is also what re-opens a re-adjudication-time
    * quality rejection via [[regateTick]] — such a doc is
    * RE-QUARANTINED under verdict 'low_quality' (its dup rows become
    * historical: a low_quality row supersedes a doc's dup-class rows in
    * the live-dup selection), so a later model swap can still flip it
    * and its text is still at hand. Only RE-ADMITTED docs resolve. */
  def readjudicateTick(st: Stores, quar: Quarantine, w: Seq[Double],
                       threshold: Double = 0.2, lowFrac: Double = 0.25,
                       idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                       census: Option[
                         ArtifactStore.GramCensusIncrementalIndex] = None,
                       ann: Option[AnnLeg] = None,
                       export: Option[ExportLeg] = None,
                       mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                       replay: Option[ReplayLeg] = None,
                       sem: Option[SemLeg] = None,
                       eval: Option[EvalLeg] = None,
                       curate: Option[CurateLeg] = None)
      : DataFrame = {
    val t = nextTick(st, idx, census, ann, export, mix, Some(quar), replay,
      sem, eval, curate)
    val rows = quar.rows.currentUpTo(t - 1).getOrElse(
      sys.error("quarantine not bootstrapped: no tick-1 base"))
    val liveRows = resolved(st,
      quar.resolvedIds.currentUpTo(t - 1)
        .fold(rows)(r => rows.join(r.select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")))
    // dup_semantic / contaminated rows re-judge ONLY when their leg is
    // attached — without its state the re-judgment would silently skip
    // that gate and wrongly re-admit them
    val dupClasses = Seq("dup_exact", "dup_fuzzy") ++
      (if (sem.isDefined) Seq("dup_semantic") else Nil) ++
      (if (eval.isDefined) Seq("contaminated") else Nil)
    val dupRows = liveRows
      .filter(col("verdict").isin(dupClasses: _*))
      .join(liveRows.filter(col("verdict") === "low_quality")
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val state = resolved(st, st.hashes.currentUpTo(t - 1).getOrElse(
        sys.error("ingest loop not bootstrapped: hash state is empty")))
      .select("ch").distinct()
    val fuzzy = Fuzzy.lshPairsAgainstState(
        resolved(st, st.bands.currentUpTo(t - 1).get),
        resolved(st, st.shingles.currentUpTo(t - 1).get),
        dupRows, threshold)
      .select(col("eval_id").as("fid")).distinct()
    val extras: Seq[(String, DataFrame)] =
      sem.map(leg => ("sid",
        semFlags(st, leg, t, dupRows.select("doc_id")))).toSeq ++
      eval.map(leg => ("cid",
        contamFlags(leg, dupRows.select("doc_id", "text")))).toSeq
    val v =
      if (extras.isEmpty) Provenance.gatedTickFrame(
        dupRows.select("doc_id", "source", "text"), state, fuzzy, w, lowFrac)
      else Provenance.gatedTickFrameWith(
        dupRows.select("doc_id", "source", "text"), state, fuzzy, extras,
        w, lowFrac)
    val admIds = v.filter(col("lq") === false).select("doc_id")
    val admDocs = dupRows.join(admIds, Seq("doc_id"), "left_semi")
    // curated fold-back of RE-ADMITTED docs (the runTickImpl rule: raw
    // evidence into the dedup stores, curated text to the serving
    // consumers; the re-judged cohort is the batch for the winner rule)
    val servedDocs = curate.map { cl =>
      graft.operators.CurateTick.curatedDocs(
        admDocs.select("doc_id", "source", "text"),
        cl.census.censusStore.currentUpTo(t - 1).getOrElse(
          sys.error("curate leg not bootstrapped: no census base")),
        dupRows.select("doc_id", "source", "text"), cl.census.k, cl.topN)
        .select("doc_id", "source", "text").localCheckpoint()
    }.getOrElse(admDocs.select("doc_id", "source", "text"))
    st.hashes.appendTickAt(t, v.filter(col("lq") === false)
      .select(col("doc_id"), col("h").as("ch")))
    st.bands.appendTickAt(t, Fuzzy.corpusBandState(admDocs))
    st.shingles.appendTickAt(t, Fuzzy.corpusShingleHashes(admDocs))
    sem.foreach(leg => leg.sigs.appendTickAt(t,
      graft.operators.SemanticGate.sigRowsOf(leg.vectors, admIds,
        leg.nTables, leg.bits, leg.dim)))
    eval.foreach(leg => leg.docGrams.appendTickAt(t,
      graft.operators.Contamination.grams(admDocs, leg.n)))
    idx.foreach(_.appendDocsAt(t, servedDocs))
    census.foreach(_.appendDocsAt(t, admDocs))
    curate.filter(cl => !census.contains(cl.census))
      .foreach(_.census.appendDocsAt(t, admDocs))
    ann.foreach { leg =>
      val (c, r) = leg.idx.servingArtifacts().getOrElse((leg.cents, leg.rcb))
      leg.idx.appendVectorsAt(t, leg.vectors.join(
        admIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        c, r)
    }
    export.foreach(leg => leg.store.appendDocsAt(t, servedDocs, leg.ms))
    mix.foreach(_.appendDocsAt(t, admDocs))
    // docs that escaped the dup gates but landed in the quality window
    // RE-QUARANTINE under their NEW evidence class (r11 advice: their
    // dup verdicts are gone, and a low_quality row is what regateTick's
    // model loop re-opens — dropping them would make re-adjudication-
    // time quality rejections terminal, contradicting the q134
    // symmetry). The new row supersedes the doc's dup rows in the
    // live-dup selection above; tick-keyed, so a replay overwrites it.
    quar.rows.appendTickAt(t, v.filter(col("lq") === true)
      .select("doc_id")
      .join(dupRows.select("doc_id", "source", "text"), "doc_id")
      .select(col("doc_id"), col("source"), col("text"),
        lit("low_quality").as("verdict")))
    // RESOLVED = re-admitted (folded into the state above): still-dup
    // docs stay re-judgeable under their dup rows; quality-rejected
    // docs stay re-judgeable under their new low_quality rows.
    quar.resolvedIds.appendTickAt(t,
      v.filter(col("lq") === false).select("doc_id"))
    // REPLAY leg: the re-adjudication's quality-windowed cohort is this
    // tick's novel cohort — persist its gate features + verdicts so a
    // later model re-gates it with zero text reads (runTick's contract)
    replay.foreach { leg =>
      val cohort = v.filter(col("lq").isNotNull)
        .select(col("doc_id"), col("source"), col("lq"))
      leg.feats.appendTickAt(t, cohort
        .join(QualityModel.gateFeatures(
          dupRows.select("doc_id", "text")), "doc_id")
        .withColumn("tick", lit(t))
        .select(Seq(col("doc_id"), col("source"), col("tick"), col("lq")) ++
          (0 until QualityModel.NumW).map(j => col(s"x$j")): _*))
    }
    if (extras.isEmpty)
      v.join(dupRows.select(col("doc_id").as("qid"),
          (col("verdict") === "dup_exact").as("was_exact")),
          col("doc_id") === col("qid"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_quarantined"),
          count(when(col("was_exact"), lit(1))).as("n_exact_t1"),
          count(when(!col("was_exact"), lit(1))).as("n_fuzzy_t1"),
          count(col("ch")).as("n_still_exact"),
          count(when(col("ch").isNull, col("fid"))).as("n_still_fuzzy"),
          count(when(col("lq") === true, lit(1))).as("n_low_quality"),
          count(when(col("lq") === false, lit(1))).as("n_readmitted"))
        .orderBy("source")
    else {
      // the q131 columns with each attached class split out — original
      // verdicts from the quarantine rows, re-judged ones from v
      val clsInfo = Seq(
        ("sid", "dup_semantic", "n_sem_t1", "n_still_semantic"),
        ("cid", "contaminated", "n_contam_t1", "n_still_contaminated"))
        .filter { case (c, _, _, _) => extras.exists(_._1 == c) }
      val t1Aggs = Seq(
        count(when(col("verdict_t1") === "dup_exact", lit(1)))
          .as("n_exact_t1"),
        count(when(col("verdict_t1") === "dup_fuzzy", lit(1)))
          .as("n_fuzzy_t1")) ++
        clsInfo.map { case (_, verdict, t1Name, _) =>
          count(when(col("verdict_t1") === verdict, lit(1))).as(t1Name)
        }
      var prev: org.apache.spark.sql.Column =
        col("ch").isNull && col("fid").isNull
      val stillAggs = Seq(count(col("ch")).as("n_still_exact"),
        count(when(col("ch").isNull, col("fid"))).as("n_still_fuzzy")) ++
        clsInfo.map { case (c, _, _, stillName) =>
          val e = count(when(prev, col(c))).as(stillName)
          prev = prev && col(c).isNull
          e
        }
      val aggs = Seq(count(lit(1)).as("n_quarantined")) ++ t1Aggs ++
        stillAggs ++ Seq(
        count(when(col("lq") === true, lit(1))).as("n_low_quality"),
        count(when(col("lq") === false, lit(1))).as("n_readmitted"))
      v.join(dupRows.select(col("doc_id").as("qid"),
          col("verdict").as("verdict_t1")),
          col("doc_id") === col("qid"))
        .groupBy("source")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("source")
    }
  }

  /** RE-GATE the quality window under a NEW model — the deployment
    * form of [[Provenance.q134QualityReadjudication]], run at a quiesce
    * point after a q113 model swap (pass
    * `modelStore.servingWeights()`): every persisted tick's NOVEL
    * cohort re-scores from its STORED gate features (zero text reads)
    * and the quality window recomputes PER TICK (tick-sized windows —
    * never a corpus-sized sort). A doc quality-rejected at tick time
    * that now clears its tick's window re-admits — its text comes from
    * the live quarantine, it folds into every store and consumer leg,
    * and its id joins `resolvedIds`; a repeated re-gate under the same
    * model is a no-op (the flip set is intersected with the LIVE
    * quarantine). Demotions (admitted docs the new model ranks into
    * the window) are REPORTED, never retracted — admission is
    * append-only short of a takedown, and the count is the audit
    * signal. Same tick/crash discipline as [[readjudicateTick]];
    * state reads resolve through the tombstone store, so a retracted
    * doc leaves the re-gate cohort too.
    *
    * Returns per source: n_novel, n_lowq_t1, n_readmitted,
    * n_still_lowq, n_demoted (the q134 columns minus the live form's
    * decision column — the CHOICE happened upstream in the q113/q128
    * machinery that produced `wNew`). */
  def regateTick(st: Stores, quar: Quarantine, replay: ReplayLeg,
                 wNew: Seq[Double], lowFrac: Double = 0.25,
                 idx: Option[ArtifactStore.Bm25IncrementalIndex] = None,
                 census: Option[
                   ArtifactStore.GramCensusIncrementalIndex] = None,
                 ann: Option[AnnLeg] = None,
                 export: Option[ExportLeg] = None,
                 mix: Option[ArtifactStore.MixIncrementalIndex] = None,
                 sem: Option[SemLeg] = None,
                 eval: Option[EvalLeg] = None,
                 curate: Option[CurateLeg] = None)
      : DataFrame = {
    val t = nextTick(st, idx, census, ann, export, mix, Some(quar),
      Some(replay), sem, eval, curate)
    val feats = resolved(st, replay.feats.currentUpTo(t - 1).getOrElse(
      sys.error("replay leg not bootstrapped: no tick-1 base")))
    val rescored = QualityModel.withScoreFromFeatures(
      feats.withColumnRenamed("lq", "was_lowq"), wNew)
    val wdw = org.apache.spark.sql.expressions.Window
      .partitionBy("tick").orderBy(col("p"), col("doc_id"))
    val flipped = rescored
      .withColumn("lq2", cume_dist().over(wdw) <= lowFrac)
      .select("doc_id", "source", "was_lowq", "lq2")
      .localCheckpoint()
    // the actually-re-admittable set: flipped out of the window AND
    // still quarantined (text lives there; already-resolved docs and
    // takedowns drop out here)
    val rows = quar.rows.currentUpTo(t - 1).getOrElse(
      sys.error("quarantine not bootstrapped: no tick-1 base"))
    val liveQuar = resolved(st,
      quar.resolvedIds.currentUpTo(t - 1)
        .fold(rows)(r => rows.join(r.select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")))
      .filter(col("verdict") === "low_quality")
    val admDocs = liveQuar
      .join(flipped.filter(col("was_lowq") && !col("lq2"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "source", "text")
      .localCheckpoint()
    val admIds = admDocs.select("doc_id")
    val servedDocs = curate.map { cl =>
      graft.operators.CurateTick.curatedDocs(admDocs,
        cl.census.censusStore.currentUpTo(t - 1).getOrElse(
          sys.error("curate leg not bootstrapped: no census base")),
        admDocs, cl.census.k, cl.topN)
        .select("doc_id", "source", "text").localCheckpoint()
    }.getOrElse(admDocs)
    st.hashes.appendTickAt(t, admDocs.select(col("doc_id"),
      Provenance.contentHash60(col("text")).as("ch")))
    st.bands.appendTickAt(t, Fuzzy.corpusBandState(admDocs))
    st.shingles.appendTickAt(t, Fuzzy.corpusShingleHashes(admDocs))
    sem.foreach(leg => leg.sigs.appendTickAt(t,
      graft.operators.SemanticGate.sigRowsOf(leg.vectors, admIds,
        leg.nTables, leg.bits, leg.dim)))
    // DECONTAM leg (r12 advice): the docGrams reverse index advances
    // with the regate tick too — regate-readmitted docs must enter it
    // (an eval-set addition retro-catches them like any admission), and
    // without the empty-or-not append the NEXT eval-attached tick's
    // agreement would land ON this tick and silently overwrite it.
    eval.foreach(leg => leg.docGrams.appendTickAt(t,
      graft.operators.Contamination.grams(admDocs, leg.n)))
    idx.foreach(_.appendDocsAt(t, servedDocs))
    census.foreach(_.appendDocsAt(t, admDocs))
    curate.filter(cl => !census.contains(cl.census))
      .foreach(_.census.appendDocsAt(t, admDocs))
    ann.foreach { leg =>
      val (c, r) = leg.idx.servingArtifacts().getOrElse((leg.cents, leg.rcb))
      leg.idx.appendVectorsAt(t, leg.vectors.join(
        admIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
        c, r)
    }
    export.foreach(leg => leg.store.appendDocsAt(t, servedDocs, leg.ms))
    mix.foreach(_.appendDocsAt(t, admDocs))
    quar.rows.appendTickAt(t, rows.limit(0))
    quar.resolvedIds.appendTickAt(t, admIds)
    replay.feats.appendTickAt(t, feats.limit(0))
    val admSet = admIds.withColumnRenamed("doc_id", "aid")
    flipped
      .join(admSet, col("doc_id") === col("aid"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_novel"),
        count(when(col("was_lowq"), lit(1))).as("n_lowq_t1"),
        count(when(col("aid").isNotNull, lit(1))).as("n_readmitted"),
        count(when(col("was_lowq") && col("lq2"), lit(1)))
          .as("n_still_lowq"),
        count(when(!col("was_lowq") && col("lq2"), lit(1)))
          .as("n_demoted"))
      .orderBy("source")
  }
}
