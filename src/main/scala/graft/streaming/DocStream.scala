package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming deduplication over a document stream — the incremental
  * form of the batch exact-dedup operator (q21): emit each distinct
  * content exactly once, on first arrival.
  *
  * Built on Structured Streaming's stateful `dropDuplicates` family —
  * the Spark-first answer (no custom state operator needed): the state
  * store keeps one entry per distinct key and the first-seen row wins,
  * deterministically, across micro-batches and restarts (state is
  * checkpointed).
  *
  * Scale posture: state is keyed by the 128-bit content hash, NOT the
  * text — O(16 bytes + rocksdb overhead) per distinct document, and the
  * hash is computed map-side so only (doc_id, hash) ever shuffles. For
  * an unbounded corpus the unbounded variant's state grows with
  * distinct contents; [[dedupWithinWatermark]] is the bounded-state
  * deployment mode — duplicates are only suppressed within the
  * watermark horizon, after which state is evicted (the standard
  * trade: re-admitted late duplicates vs bounded memory).
  */
object DocStream {

  /** Stream element: a document with an ingestion timestamp (ns). */
  case class Doc(doc_id: Long, ts: Long, text: String)

  /** Unbounded first-seen exact dedup: one output row per distinct
    * content, the first arrival. Append-mode safe. */
  def dedupFirstSeen(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .dropDuplicates("text_md5")

  /** Watermark-bounded dedup: suppress duplicates arriving within
    * `watermark` of the original (event-time); state for keys older
    * than the watermark is evicted, so a duplicate after the horizon
    * re-emits. `ts` is nanoseconds (integral `div`, not `/`: double
    * division corrupts the low microseconds above 2^53). */
  def dedupWithinWatermark(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .select(col("doc_id"),
        timestamp_micros(expr("ts div 1000")).as("ts_utc"),
        md5(col("text")).as("text_md5"))
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  /** Streaming corpus curation — the incremental form of the batch q40
    * pipeline: quality/language gate (the same row-local
    * [[graft.operators.LangQuality]] expressions — stateless, map-side)
    * → first-seen exact dedup (stateful, hash-keyed) → per-language
    * token accounting over event-time windows (watermarked, append-mode
    * emittable once the window closes).
    *
    * This is the shape of a production ingest loop: every operator is
    * the already-vetted batch expression, and the only state is the
    * dedup keys plus one open aggregation window per language. Near-dup
    * (Jaccard) removal stays a batch compaction pass (q22/q56) — its
    * pair relation is inherently cross-document and unbounded-lookback,
    * exactly what streaming state must not be. */
  def curatedStream(docs: DataFrame, qmin: Double = 0.4,
                    watermark: String = "1 hour",
                    window: String = "1 hour"): DataFrame = {
    val gated = graft.operators.LangQuality.withLangQuality(docs)
      .withColumn("n_bpe_tokens", graft.operators.LangQuality.bpeTokens)
      .filter(col("quality") >= qmin)
      .select(col("doc_id"), col("ts"), col("lang_pred"), col("n_bpe_tokens"),
        md5(col("text")).as("text_md5"))
    gated
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
      .groupBy(org.apache.spark.sql.functions.window(col("ts_utc"), window),
        col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
           sum("n_bpe_tokens").as("sum_bpe_tokens"))
      .select(col("window.start").as("win_start"), col("lang_pred"),
        col("n_docs"), col("sum_bpe_tokens"))
  }

  /** Per-document admission verdict emitted by [[admissionStream]]. */
  case class Admission(doc_id: Long, h: Long, verdict: String)

  /** Dedup-state payload: whether the hash was seeded from the batch
    * corpus (vs first seen on the stream). One boolean per distinct
    * hash — with the 8-byte key, ~9 bytes of state per distinct
    * document content, same footprint argument as batch q73. */
  case class AdmitState(fromCorpus: Boolean)

  /** Bootstrapped streaming admission — the streaming twin of the batch
    * incremental-dedup report (q73, `Provenance.q73IncrementalDedup`):
    * a continuous ingest stream is admitted against the EXISTING
    * corpus, without ever rescanning corpus text.
    *
    * `corpusHashes` is the persisted corpus state — one `h` column of
    * the portable 60-bit content hashes (the q70 manifest / q73 state
    * convention: `conv(substring(md5(text),1,15),16,10)`). It seeds
    * `flatMapGroupsWithState`'s `initialState`, so the state store
    * starts as the corpus membership set and the stream then maintains
    * it incrementally: each arriving document is verdicted
    * `dup_corpus` (hash seeded from the corpus), `dup_stream` (first
    * seen earlier ON the stream — including earlier in the same
    * micro-batch, ordered by doc_id), or `new` (admit it).
    *
    * Scale shape: the corpus side reduces to 8-byte hashes map-side
    * and is shuffled ONCE into the state store's key partitioning at
    * query start; per micro-batch, only the batch's (doc_id, h) pairs
    * shuffle — the exact cost profile of the batch q73 join, but with
    * the corpus-state scan amortized across all future ticks instead
    * of re-read per tick. Unbounded-corpus deployments bound state the
    * same way [[dedupWithinWatermark]] does — this variant is the
    * exact-membership mode.
    *
    * Durability: state (including the corpus seed) lives in the
    * checkpointed state store — a restarted query restores it from the
    * checkpoint and does NOT re-seed from `initialState`, so kill +
    * restart loses nothing and re-verdicts nothing (DocStreamSpec's
    * kill/restart test pins this, with the corpus side loaded from the
    * persisted [[graft.io.ArtifactStore]] hash artifact). */
  def admissionStream(docs: DataFrame, corpusHashes: DataFrame): Dataset[Admission] = {
    val spark = docs.sparkSession
    import spark.implicits._
    admissionStreamWithText(docs, corpusHashes)
      .map(a => Admission(a.doc_id, a.h, a.verdict))
  }

  /** [[Admission]] plus the document text — the fuzzy path's input:
    * text rides along so the per-batch refinement can shingle 'new'
    * docs without a second source read. */
  case class AdmissionDoc(doc_id: Long, h: Long, verdict: String, text: String)

  /** [[admissionStream]] with the text column carried through the state
    * operator — the ONE stateful definition both forms share (the state
    * key, payload, and verdict logic are identical, so checkpoints are
    * interchangeable between the two). */
  def admissionStreamWithText(docs: DataFrame,
                              corpusHashes: DataFrame): Dataset[AdmissionDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col("doc_id").cast("long"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"),
        col("text"))
      .as[(Long, Long, String)]
    val init = corpusHashes.select(col("h").cast("long")).distinct().as[Long]
      .groupByKey(identity).mapValues(_ => AdmitState(fromCorpus = true))
    hashed
      .groupByKey(_._2)
      .flatMapGroupsWithState[AdmitState, AdmissionDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout(), init) {
        case (h, rows, state: GroupState[AdmitState]) =>
          // deterministic within-batch order: lowest doc_id is "first"
          val sorted = rows.toSeq.sortBy(_._1)
          val verdicts =
            if (state.exists && state.get.fromCorpus)
              sorted.map(r => AdmissionDoc(r._1, h, "dup_corpus", r._3))
            else if (state.exists)
              sorted.map(r => AdmissionDoc(r._1, h, "dup_stream", r._3))
            else
              AdmissionDoc(sorted.head._1, h, "new", sorted.head._3) ::
                sorted.tail.map(r => AdmissionDoc(r._1, h, "dup_stream", r._3)).toList
          if (!state.exists) state.update(AdmitState(fromCorpus = false))
          verdicts.iterator
      }
  }

  /** Per-micro-batch fuzzy refinement — the q92 near-dup gate applied
    * to a micro-batch's exact verdicts: docs the exact pass called
    * 'new' but whose shingles band-collide with the PERSISTED corpus
    * LSH state (and exact-verify at Jaccard ≥ threshold —
    * [[graft.operators.Fuzzy.lshPairsAgainstState]]) downgrade to
    * 'dup_corpus_fuzzy'. A plain batch transform, run inside
    * foreachBatch where the full batch API (groupBy, joins) is legal —
    * chaining a second stateful/aggregating operator after
    * flatMapGroupsWithState is not, and the corpus side is static
    * state anyway.
    *
    * Deliberately corpus-only: near-dups of earlier STREAM docs are
    * NOT caught here — that would require unbounded cross-doc text
    * state in the store, exactly what [[curatedStream]]'s scaladoc
    * argues streaming state must never hold. A deployment folds
    * admitted docs into the corpus band/shingle artifacts between
    * ticks (the q73 state-maintenance loop), which also upgrades
    * stream-vs-stream near-dups to corpus ones at the next tick. */
  def refineFuzzy(batch: DataFrame, corpusBands: DataFrame,
                  corpusShingles: DataFrame, threshold: Double): DataFrame = {
    val newDocs = batch.filter(col("verdict") === "new").select("doc_id", "text")
    val fuzzy = graft.operators.Fuzzy
      .lshPairsAgainstState(corpusBands, corpusShingles, newDocs, threshold)
      .select(col("eval_id").as("fid")).distinct()
    batch
      .join(fuzzy, col("doc_id") === col("fid"), "left")
      .withColumn("verdict",
        when(col("fid").isNotNull, lit("dup_corpus_fuzzy"))
          .otherwise(col("verdict")))
      .select("doc_id", "h", "verdict", "text")
  }

  /** Per-micro-batch learned quality gate — q103's BUDGET verdict in
    * the stream: among this batch's post-fuzzy 'new' docs, the bottom
    * `lowFrac` by FROZEN-model score drop to 'low_quality'. The
    * weights are literals (trained once — or ArtifactStore-loaded —
    * when the query is built), so a restarted query trivially scores
    * identically; the cume_dist window is global but scoped to ONE
    * micro-batch's novel docs (tick-sized — the q103 documented
    * exception), and the budget is per tick BY CONSTRUCTION.
    *
    * BATCH-INTERNAL-DUP CAVEAT (r9 advice): the window here ranges
    * over post-fuzzy 'new' docs, which EXCLUDES batch-internal exact
    * duplicates — the stream verdicts those 'dup_stream' upstream,
    * a category batch q103 does not have: q103 counts such docs as
    * novel and includes them in its cume_dist denominator. On a tick
    * containing internal exact duplicates the two low_quality sets
    * therefore diverge (the stream's denominator is smaller); on
    * dup-free ticks they agree exactly. DocStreamSpec reconciles on
    * the latter; a deployment that needs bit-equal budgets on dup
    * ticks runs the batch q103 report instead. */
  def refineQuality(batch: DataFrame, weights: Seq[Double],
                    lowFrac: Double): DataFrame = {
    val scored = graft.operators.QualityModel.scores(
      batch.filter(col("verdict") === "new").select("doc_id", "text"), weights)
    val lq = scored
      .withColumn("cd", cume_dist().over(
        org.apache.spark.sql.expressions.Window.orderBy("p", "doc_id")))
      .filter(col("cd") <= lowFrac).select(col("doc_id").as("lqid"))
    batch.join(lq, col("doc_id") === col("lqid"), "left")
      .withColumn("verdict",
        when(col("lqid").isNotNull, lit("low_quality")).otherwise(col("verdict")))
      .select("doc_id", "h", "verdict", "text")
  }

  /** Bootstrapped FUZZY admission query — the streaming twin of q92:
    * exact first-seen dedup upstream in the checkpointed state store
    * ([[admissionStreamWithText]]), per-batch fuzzy refinement +
    * parquet write inside foreachBatch. Each micro-batch overwrites
    * its own `batch=<id>` partition directory, so a batch REPLAYED
    * after a crash rewrites the same files instead of appending
    * duplicates — idempotent sink, exactly-once output under
    * at-least-once foreachBatch semantics. Restart-safe end to end:
    * exact state restores from the checkpoint (never re-seeded), and
    * the band/shingle state is fingerprint-keyed ArtifactStore parquet
    * re-loaded identically on restart (DocStreamSpec pins both across
    * a kill). */
  def fuzzyAdmissionQuery(docs: DataFrame, corpusHashes: DataFrame,
                          corpusBands: DataFrame, corpusShingles: DataFrame,
                          outPath: String, checkpoint: String,
                          threshold: Double = 0.2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    admissionStreamWithText(docs, corpusHashes)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[AdmissionDoc], batchId: Long) =>
        refineFuzzy(b.toDF(), corpusBands, corpusShingles, threshold)
          .drop("text")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

  /** GATED admission query — the streaming twin of q103 (the complete
    * ingest tick): exact first-seen dedup in the checkpointed state
    * store, then per-batch fuzzy refinement against the persisted
    * corpus LSH state, then the learned budget gate under frozen
    * weights — verdict precedence dup_corpus → dup_stream →
    * dup_corpus_fuzzy → low_quality → new, written idempotently per
    * micro-batch like [[fuzzyAdmissionQuery]]. DocStreamSpec pins
    * reconciliation with the batch q103 report on the same split —
    * exact on ticks without batch-internal exact duplicates; see
    * [[refineQuality]] for the documented divergence when a tick
    * carries internal dups (the stream's budget denominator excludes
    * its dup_stream docs, a category q103 lacks). */
  def gatedAdmissionQuery(docs: DataFrame, corpusHashes: DataFrame,
                          corpusBands: DataFrame, corpusShingles: DataFrame,
                          weights: Seq[Double],
                          outPath: String, checkpoint: String,
                          threshold: Double = 0.2, lowFrac: Double = 0.25)
      : org.apache.spark.sql.streaming.StreamingQuery =
    admissionStreamWithText(docs, corpusHashes)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[AdmissionDoc], batchId: Long) =>
        refineQuality(
          refineFuzzy(b.toDF(), corpusBands, corpusShingles, threshold),
          weights, lowFrac)
          .drop("text")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

  /** FOLDING gated admission — the streaming closure of the ingest
    * state loop (r9 verdict item 1, stream form): like
    * [[gatedAdmissionQuery]], but between micro-batches the ADMITTED
    * docs' band/shingle/hash increments are folded into the
    * [[graft.io.IngestLoop.Stores]], so batch N+1's fuzzy refinement
    * judges against base corpus ∪ everything admitted through batch N.
    * This upgrades the documented [[refineFuzzy]] stream-vs-stream
    * near-dup miss into caught-at-next-tick, exactly as that scaladoc
    * promises.
    *
    * Replay discipline (exactly-once under at-least-once foreachBatch):
    * fold ticks are keyed BY MICRO-BATCH ID
    * (`IngestStateStore.appendTickAt(batchId + 2)` — tick 1 is the
    * bootstrap), and the refinement reads `currentUpTo(batchId + 1)` —
    * the state as of the PREVIOUS batch. A replayed batch therefore
    * excludes its own possibly-already-written fold tick and reproduces
    * its verdicts bit-identically, then overwrites the same fold tick
    * and the same `batch=<id>` output partition — idempotent end to
    * end (DocStreamSpec pins verdicts across a kill/restart). The
    * exact-dedup state needs no folding: it lives in the streaming
    * checkpoint and [[admissionStreamWithText]] maintains it in-stream
    * — `corpusHashes` (the persisted ArtifactStore artifact, per the
    * other admission queries) only SEEDS it at first start, which is
    * also why it is a parameter rather than a read of
    * `stores.hashes`: the seed must survive compaction of the fold
    * stores. Compact the stores only while the query is stopped and
    * committed (`IngestStateStore.currentUpTo` throws if a replay
    * would need increments a compaction folded away). */
  def foldingGatedAdmissionQuery(docs: DataFrame, corpusHashes: DataFrame,
                                 stores: graft.io.IngestLoop.Stores,
                                 weights: Seq[Double],
                                 outPath: String, checkpoint: String,
                                 threshold: Double = 0.2,
                                 lowFrac: Double = 0.25,
                                 idx: Option[graft.io.ArtifactStore.Bm25IncrementalIndex] = None,
                                 census: Option[graft.io.ArtifactStore.GramCensusIncrementalIndex] = None,
                                 ann: Option[graft.io.IngestLoop.AnnLeg] = None,
                                 export: Option[graft.io.IngestLoop.ExportLeg] = None,
                                 quar: Option[graft.io.IngestLoop.Quarantine] = None,
                                 sem: Option[graft.io.IngestLoop.SemLeg] = None,
                                 eval: Option[graft.io.IngestLoop.EvalLeg] = None,
                                 curate: Option[graft.io.IngestLoop.CurateLeg] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    admissionStreamWithText(docs, corpusHashes)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[AdmissionDoc], batchId: Long) =>
        val stateTick = batchId + 1 // bootstrap=1, batch k folds at k+2
        // state reads resolve through the shared tombstone store: a
        // quiesce-point takedown between stream runs stops rejecting
        // the retracted docs' near-dups here too (the exact-hash layer
        // lives in the streaming checkpoint — see the takedown caveat
        // in the method scaladoc)
        val rs = (df: DataFrame) =>
          graft.io.IngestLoop.resolved(stores, df)
        val fuzzed = refineFuzzy(b.toDF(),
          rs(stores.bands.currentUpTo(stateTick).get),
          rs(stores.shingles.currentUpTo(stateTick).get), threshold)
        val evaled = refineContamLeg(
          refineSemanticLeg(fuzzed, stores, sem, stateTick), eval)
        val refined = refineQuality(evaled, weights, lowFrac)
          // severed: read by the sink write AND the fold increments
          .localCheckpoint()
        refined.drop("text")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        val adm = refined.filter(col("verdict") === "new")
          .select("doc_id", "text")
        val served = curatedServed(refined, b.toDF().select("doc_id", "text"),
          stateTick, outPath, batchId, curate, adm)
        stores.hashes.appendTickAt(stateTick + 1,
          graft.operators.Provenance.corpusDocHashes(adm))
        stores.bands.appendTickAt(stateTick + 1,
          graft.operators.Fuzzy.corpusBandState(adm))
        stores.shingles.appendTickAt(stateTick + 1,
          graft.operators.Fuzzy.corpusShingleHashes(adm))
        sem.foreach(leg => leg.sigs.appendTickAt(stateTick + 1,
          graft.operators.SemanticGate.sigRowsOf(leg.vectors,
            adm.select("doc_id"), leg.nTables, leg.bits, leg.dim)))
        eval.foreach(leg => leg.docGrams.appendTickAt(stateTick + 1,
          graft.operators.Contamination.grams(adm, leg.n)))
        foldConsumerLegs(adm, served, stateTick + 1, idx, census, ann, export)
        // a curate leg whose census is NOT the stream's census leg still
        // folds the RAW admitted increment (same object → no double fold
        // — the runTickImpl rule)
        curate.filter(cl => !census.contains(cl.census))
          .foreach(_.census.appendDocsAt(stateTick + 1, adm))
        foldQuarantine(refined, stateTick + 1, quar)
      }
      .start()
  }

  /** SEMANTIC leg refinement (the q135 symmetry in streaming): docs the
    * text gates called 'new' judge against the folded RP-LSH signature
    * state — an embedding near-dup of an earlier micro-batch's
    * admission is caught at the next batch, like every other evidence
    * class. Signature reads resolve through the shared tombstones, so
    * quiesce-point takedowns reach this leg too; at a rollover boundary
    * the sig store re-seeds like the band state
    * ([[graft.io.IngestLoop.rolloverSem]]). */
  private def refineSemanticLeg(batch: DataFrame,
                                stores: graft.io.IngestLoop.Stores,
                                sem: Option[graft.io.IngestLoop.SemLeg],
                                stateTick: Long): DataFrame = sem match {
    case None => batch
    case Some(leg) =>
      val flags = graft.operators.SemanticGate.flaggedAgainstState(
        graft.io.IngestLoop.resolved(stores,
          leg.sigs.currentUpTo(stateTick).getOrElse(
            sys.error("semantic leg not bootstrapped"))),
        leg.vectors,
        batch.filter(col("verdict") === "new").select("doc_id"),
        leg.nTables, leg.bits, leg.dim, leg.simThreshold)
      batch.join(flags, col("doc_id") === col("sid"), "left")
        .withColumn("verdict",
          when(col("verdict") =!= "new", col("verdict"))
            .when(col("sid").isNotNull, lit("dup_corpus_semantic"))
            .otherwise(col("verdict")))
        .drop("sid")
  }

  /** DECONTAM leg refinement (the q136 symmetry in streaming):
    * surviving 'new' docs judge against the LIVE eval-set state
    * (withdrawals resolve through the eval tombstones at every batch);
    * the stream verdict is the batch evidence class itself. An eval-set
    * UPDATE stays a quiesce-point operation — evalUpdateTick between
    * runs retro-catches from the docGrams the fold maintains, and
    * readjudicateTick recovers withdrawn-evidence rejections from the
    * quarantine. */
  private def refineContamLeg(batch: DataFrame,
                              eval: Option[graft.io.IngestLoop.EvalLeg])
      : DataFrame = eval match {
    case None => batch
    case Some(leg) =>
      val flags = graft.io.IngestLoop.contamFlags(leg,
        batch.filter(col("verdict") === "new").select("doc_id", "text"))
      batch.join(flags, col("doc_id") === col("cid"), "left")
        .withColumn("verdict",
          when(col("verdict") =!= "new", col("verdict"))
            .when(col("cid").isNotNull, lit("contaminated"))
            .otherwise(col("verdict")))
        .drop("cid")
  }

  /** MODALITY eval channels in the mm stream (the q140 symmetry):
    * surviving 'new' docs whose image/audio signature popcount-matches
    * a LIVE eval item's signature verdict `contaminated` — withdrawals
    * resolve through the shared eval tombstones at every batch, and
    * quiesce-point updates ([[graft.io.IngestLoop.evalUpdateMmTick]])
    * retro-catch from the loop's maintained doc sig stores. No-op for
    * a text-only eval leg. */
  private def refineMmEvalLeg(batch: DataFrame,
                              eval: Option[graft.io.IngestLoop.EvalLeg],
                              bISigs: DataFrame, bASigs: DataFrame)
      : DataFrame = eval match {
    case Some(leg) if leg.imgSigs.isDefined || leg.audSigs.isDefined =>
      import graft.multimodal.Multimodal
      val newIds = batch.filter(col("verdict") === "new").select("doc_id")
      def hits(store: Option[graft.io.ArtifactStore.IngestStateStore],
               sigs: DataFrame): Option[DataFrame] =
        store.map(s => Multimodal.flaggedAgainstState(
            graft.io.IngestLoop.resolvedEval(leg, s.current().getOrElse(
              sys.error("mm eval leg not bootstrapped: no sig base"))),
            sigs.join(newIds, Seq("doc_id"), "left_semi")
              .filter(col("sig").isNotNull),
            leg.maxDist, leg.maxBand)
          .select(col("fid").as("mcid")))
      val flags = (hits(leg.imgSigs, bISigs) ++ hits(leg.audSigs, bASigs))
        .reduce(_ union _).distinct()
      batch.join(flags, col("doc_id") === col("mcid"), "left")
        .withColumn("verdict",
          when(col("verdict") =!= "new", col("verdict"))
            .when(col("mcid").isNotNull, lit("contaminated"))
            .otherwise(col("verdict")))
        .drop("mcid")
    case _ => batch
  }

  /** CURATE leg (the q137 symmetry in streaming — r12 verdict item 1):
    * the batch tick serves census-stripped + PII-scrubbed text while
    * the streaming folds served RAW admitted text, so a streaming
    * deployment exported boilerplate and unscrubbed PII the batch path
    * removed. Admitted docs strip against the maintained census ∪ the
    * micro-batch's own increment (the q129/q137 winner rule, at the
    * census's granularity) then scrub, and the CURATED form is what
    * [[foldConsumerLegs]] feeds the serving consumers (BM25 postings,
    * packed export) — while the dedup stores, the quarantine, and the
    * census keep folding RAW text (the two-column provenance
    * discipline; the census is the strip-rule source). The per-batch
    * rewrite audit (the q137 report columns: tokens_raw /
    * tokens_removed / chars_redacted / `exact_curated_sig`) lands
    * idempotently under `outPath/batch=<id>/_audit` — the underscore
    * prefix keeps it invisible to whole-tree reads of the verdict
    * output, and the batch's verdict overwrite (which wipes the batch
    * dir) runs BEFORE this, so a replayed batch rewrites the same
    * audit like everything else it writes. Returns
    * the (doc_id, text=CURATED) frame for the consumer folds (`adm`
    * unchanged when no leg is attached). */
  private def curatedServed(refined: DataFrame, rawBatch: DataFrame,
                            stateTick: Long, outPath: String, batchId: Long,
                            curate: Option[graft.io.IngestLoop.CurateLeg],
                            adm: DataFrame): DataFrame = curate match {
    case None => adm
    case Some(cl) =>
      val cur = graft.operators.CurateTick.curatedDocs(
        refined.filter(col("verdict") === "new")
          .select(col("doc_id"), lit("stream").as("source"), col("text")),
        cl.census.censusStore.currentUpTo(stateTick).getOrElse(
          sys.error("curate leg not bootstrapped: no census base")),
        rawBatch, cl.census.k, cl.topN)
        // severed: read by the audit write AND the consumer folds
        .localCheckpoint()
      cur.select(col("source"), col("n_tokens"), col("n_removed"),
          col("chars_redacted"),
          graft.operators.Provenance.contentHash60(col("text")).as("chc"))
        .groupBy("source")
        .agg(sum("n_tokens").as("tokens_raw"),
          sum("n_removed").as("tokens_removed"),
          sum("chars_redacted").as("chars_redacted"),
          expr("bit_xor(chc)").as("exact_curated_sig"))
        .write.mode("overwrite").parquet(s"$outPath/batch=$batchId/_audit")
      cur.select("doc_id", "text")
  }

  /** The QUARANTINE fold (the q131 symmetry in streaming — rejected ≠
    * discarded holds for stream arrivals too): each micro-batch's
    * rejected docs land in the quarantine store under the same
    * batch-id-keyed tick, with the stream verdicts mapped to the batch
    * evidence classes (`dup_corpus`/`dup_stream` → dup_exact — both are
    * hash-state evidence after the fold-back; `dup_corpus_fuzzy` →
    * dup_fuzzy; `low_quality` kept as is). The wire schema carries no
    * `source` column, so quarantine rows carry the literal 'stream'.
    * A quiesce-point takedown then recovers stream rejections through
    * the SAME batch-side [[graft.io.IngestLoop.readjudicateTick]] —
    * after [[graft.io.IngestLoop.rollover]] +
    * [[graft.io.IngestLoop.rolloverQuarantine]], whose tick-1 re-seed
    * keeps the two bundles' tick agreements aligned (DocStreamSpec pins
    * the full boundary flow). */
  private def foldQuarantine(refined: DataFrame, tick: Long,
                             quar: Option[graft.io.IngestLoop.Quarantine])
      : Unit =
    quar.foreach { qs =>
      val rej = refined.filter(col("verdict") =!= "new")
        .select(col("doc_id"), lit("stream").as("source"), col("text"),
          when(col("verdict").isin("dup_corpus", "dup_stream"),
            lit("dup_exact"))
            .when(col("verdict") === "dup_corpus_fuzzy", lit("dup_fuzzy"))
            .when(col("verdict") === "dup_corpus_semantic",
              lit("dup_semantic"))
            .otherwise(col("verdict")).as("verdict"))
      qs.rows.appendTickAt(tick, rej)
      qs.resolvedIds.appendTickAt(tick,
        refined.select("doc_id").limit(0))
    }

  /** The consumer-leg folds one micro-batch's ADMITTED docs feed — the
    * [[graft.io.IngestLoop.runFullTick]] symmetry in streaming, shared
    * by the text and multimodal folding queries. All legs append under
    * the same batch-id-keyed tick as the dedup folds, so a replayed
    * batch overwrites its own increments (exactly-once effect under
    * at-least-once foreachBatch) and no served state ever lags the
    * stream's admissions:
    *
    *   - RETRIEVAL (r10 item 7): BM25 postings — DocStreamSpec pins
    *     served ranking ≡ a batch rebuild over base ∪ all admissions
    *     across kill/restart; each batch tokenized exactly once.
    *   - CURATION: the gram census — same pin; a takedown's
    *     subtraction leg composes via IngestLoop.retractTick as in
    *     batch.
    *   - ANN (the q124 symmetry): admitted docs' embeddings (semi-
    *     joined from the leg's side table) encode under the index's
    *     CURRENT serving artifacts; served codes ≡ a batch re-encode
    *     over base ∪ all stream admissions.
    *   - EXPORT (the q125 symmetry): admitted docs pack as the batch's
    *     epoch under the frozen merges; a replayed batch writes an
    *     identical next revision (complete-or-invisible). Streaming
    *     epochs are micro-batch-sized — a deployment whose batches are
    *     small compacts by re-exporting at quiesce points (the
    *     PackedExportStore scaladoc's epoch-count argument).
    *
    * `served` is the text the SERVING consumers (postings, export)
    * receive — the curated form when a [[curatedServed]] leg is
    * attached, `adm` itself otherwise; the census and the ANN id
    * semi-join always work from the RAW admitted frame (the q137
    * two-column provenance rule). Every index must be bootstrapped
    * from the same corpus as the stores (tick 1) before the query
    * starts. */
  private def foldConsumerLegs(adm: DataFrame, served: DataFrame, tick: Long,
                               idx: Option[graft.io.ArtifactStore.Bm25IncrementalIndex],
                               census: Option[graft.io.ArtifactStore.GramCensusIncrementalIndex],
                               ann: Option[graft.io.IngestLoop.AnnLeg],
                               export: Option[graft.io.IngestLoop.ExportLeg])
      : Unit = {
    // (no mix leg here: the stream wire schema carries no `source`
    // column — the domain-mix state is a batch-loop leg)
    idx.foreach(_.appendDocsAt(tick, served))
    census.foreach(_.appendDocsAt(tick, adm))
    ann.foreach { leg =>
      val (c, r) = leg.idx.servingArtifacts()
        .getOrElse((leg.cents, leg.rcb))
      leg.idx.appendVectorsAt(tick, leg.vectors.join(
        adm.select(col("doc_id").as("vec_id")), Seq("vec_id"),
        "left_semi"), c, r)
    }
    export.foreach(leg => leg.store.appendDocsAt(tick, served, leg.ms))
  }

  /** MULTIMODAL folding admission — the [[graft.io.IngestLoop
    * .runMmTick]] twin in streaming: per micro-batch, docs the exact
    * pass called 'new' refine through fuzzy text (persisted LSH state),
    * then image and audio perceptual signatures against the persisted
    * sig stores (verdict precedence dup_corpus/dup_stream →
    * dup_corpus_fuzzy → dup_image → dup_audio → low_quality → new —
    * q118's precedence with the stream's exact layer spliced in), and
    * ONLY admitted docs fold back into all five stores — so batch N+1
    * rejects an image/audio near-dup of what batch N admitted, without
    * waiting for a batch tick. Same batch-id-keyed replay discipline
    * as [[foldingGatedAdmissionQuery]]; optional consumer legs via
    * [[foldConsumerLegs]].
    *
    * Takedown caveat (both folding queries): the fuzzy/signature state
    * resolves through the shared tombstone store at every batch, so a
    * quiesce-point [[graft.io.IngestLoop.retractTick]] between stream
    * runs reaches them; the EXACT-hash layer, however, lives in the
    * streaming checkpoint (seeded once from `corpusHashes`), so a
    * takedown of exact content requires restarting the query with a
    * fresh checkpoint re-seeded from the post-retraction hash state —
    * run takedowns at stream restart boundaries. The same boundary
    * governs the quality `weights`: they are frozen for the run (a
    * literal folded into every micro-batch's scoring projection), so
    * a takedown that unlearns the serving model
    * ([[graft.io.ArtifactStore.ModelStore]]) or a q113 refresh takes
    * effect at the next start — pass `modelStore.servingWeights()`
    * there, never a stale copy. */
  def foldingMmAdmissionQuery(docs: DataFrame, corpusHashes: DataFrame,
                              stores: graft.io.IngestLoop.MmStores,
                              weights: Seq[Double],
                              outPath: String, checkpoint: String,
                              threshold: Double = 0.2,
                              lowFrac: Double = 0.25,
                              maxDist: Int = 10, maxBand: Int = 64,
                              idx: Option[graft.io.ArtifactStore.Bm25IncrementalIndex] = None,
                              census: Option[graft.io.ArtifactStore.GramCensusIncrementalIndex] = None,
                              ann: Option[graft.io.IngestLoop.AnnLeg] = None,
                              export: Option[graft.io.IngestLoop.ExportLeg] = None,
                              quar: Option[graft.io.IngestLoop.Quarantine] = None,
                              sem: Option[graft.io.IngestLoop.SemLeg] = None,
                              eval: Option[graft.io.IngestLoop.EvalLeg] = None,
                              curate: Option[graft.io.IngestLoop.CurateLeg] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.multimodal.Multimodal
    admissionStreamWithText(docs, corpusHashes)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[AdmissionDoc], batchId: Long) =>
        val stateTick = batchId + 1
        val rs = (df: DataFrame) =>
          graft.io.IngestLoop.resolved(stores.text, df)
        val fuzzed = refineFuzzy(b.toDF(),
          rs(stores.text.bands.currentUpTo(stateTick).get),
          rs(stores.text.shingles.currentUpTo(stateTick).get), threshold)
        // batch signatures derive once at the codec seam for the WHOLE
        // micro-batch (the runMmTick convention — the quarantine leg
        // needs every rejected doc's sigs as its mm evidence); severed —
        // read by the flag joins, the fold-back, AND the quarantine
        val bISigs = Multimodal.imageSigs(b.toDF().select("doc_id"))
          .localCheckpoint()
        val bASigs = Multimodal.audioSigs(b.toDF().select("doc_id"))
          .localCheckpoint()
        // the r12-verdict symmetry: the mm BATCH tick gates seven
        // classes; the stream applies the same extra evidence legs
        // here, BEFORE the dedup modality signatures — eval/text
        // evidence outranks modality DEDUP signatures (the q133
        // cross-evidence discipline, same precedence as
        // mmGatedTickFrameWith), and an mm eval leg's q140 channels
        // judge the batch sigs against the LIVE eval media
        val evaled = refineMmEvalLeg(
          refineContamLeg(
            refineSemanticLeg(fuzzed, stores.text, sem, stateTick), eval),
          eval, bISigs, bASigs)
        val imFlag = Multimodal.flaggedAgainstState(
            rs(stores.imgSigs.currentUpTo(stateTick).get),
            bISigs, maxDist, maxBand)
          .select(col("fid").as("ifid"))
        val auFlag = Multimodal.flaggedAgainstState(
            rs(stores.audSigs.currentUpTo(stateTick).get),
            bASigs, maxDist, maxBand)
          .select(col("fid").as("afid"))
        val mmRefined = evaled
          .join(imFlag, col("doc_id") === col("ifid"), "left")
          .join(auFlag, col("doc_id") === col("afid"), "left")
          .withColumn("verdict",
            when(col("verdict") =!= "new", col("verdict"))
              .when(col("ifid").isNotNull, lit("dup_corpus_image"))
              .when(col("afid").isNotNull, lit("dup_corpus_audio"))
              .otherwise(col("verdict")))
          .select("doc_id", "h", "verdict", "text")
        val refined = refineQuality(mmRefined, weights, lowFrac)
          .localCheckpoint()
        refined.drop("text")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        val adm = refined.filter(col("verdict") === "new")
          .select("doc_id", "text")
        val served = curatedServed(refined, b.toDF().select("doc_id", "text"),
          stateTick, outPath, batchId, curate, adm)
        stores.text.hashes.appendTickAt(stateTick + 1,
          graft.operators.Provenance.corpusDocHashes(adm))
        stores.text.bands.appendTickAt(stateTick + 1,
          graft.operators.Fuzzy.corpusBandState(adm))
        stores.text.shingles.appendTickAt(stateTick + 1,
          graft.operators.Fuzzy.corpusShingleHashes(adm))
        stores.imgSigs.appendTickAt(stateTick + 1,
          bISigs.join(adm.select("doc_id"), Seq("doc_id"), "left_semi"))
        stores.audSigs.appendTickAt(stateTick + 1,
          bASigs.join(adm.select("doc_id"), Seq("doc_id"), "left_semi"))
        sem.foreach(leg => leg.sigs.appendTickAt(stateTick + 1,
          graft.operators.SemanticGate.sigRowsOf(leg.vectors,
            adm.select("doc_id"), leg.nTables, leg.bits, leg.dim)))
        eval.foreach(leg => leg.docGrams.appendTickAt(stateTick + 1,
          graft.operators.Contamination.grams(adm, leg.n)))
        foldConsumerLegs(adm, served, stateTick + 1, idx, census, ann, export)
        curate.filter(cl => !census.contains(cl.census))
          .foreach(_.census.appendDocsAt(stateTick + 1, adm))
        // the mm QUARANTINE fold (rejected ≠ discarded for stream
        // arrivals of every modality — the text twin's q131 symmetry):
        // rejected docs land with their 8-byte signatures so a
        // quiesce-point readjudicateMmTick re-judges all evidence
        // classes without re-reading payloads, after rollover +
        // rolloverQuarantine re-seed the bundle (the restart-boundary
        // contract). Verdicts map to the batch evidence classes as in
        // the text fold.
        quar.foreach { qs =>
          val rej = refined.filter(col("verdict") =!= "new")
            .select(col("doc_id"), lit("stream").as("source"), col("text"),
              when(col("verdict").isin("dup_corpus", "dup_stream"),
                lit("dup_exact"))
                .when(col("verdict") === "dup_corpus_fuzzy",
                  lit("dup_fuzzy"))
                .when(col("verdict") === "dup_corpus_semantic",
                  lit("dup_semantic"))
                .when(col("verdict") === "dup_corpus_image",
                  lit("dup_image"))
                .when(col("verdict") === "dup_corpus_audio",
                  lit("dup_audio"))
                .otherwise(col("verdict")).as("verdict"))
            .join(bISigs.select(col("doc_id"), col("sig").as("img_sig")),
              Seq("doc_id"), "left")
            .join(bASigs.select(col("doc_id"), col("sig").as("aud_sig")),
              Seq("doc_id"), "left")
            .select("doc_id", "source", "text", "img_sig", "aud_sig",
              "verdict")
          qs.rows.appendTickAt(stateTick + 1, rej)
          qs.resolvedIds.appendTickAt(stateTick + 1,
            refined.select("doc_id").limit(0))
        }
      }
      .start()
  }

  /** JSONL wire schema for a document drop directory. */
  val JsonlDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("ts", LongType),
    StructField("text", StringType)))

  /** End-to-end streaming curation over the engine's OWN wire format:
    * a JSONL drop directory ([[graft.io.JsonLines.readStream]] — files
    * landing in `dir` are picked up per micro-batch) feeding
    * [[curatedStream]], with the JSONL source's corrupt-line accounting
    * preserved: returns (curated windows, corrupt lines). A malformed
    * line never kills the ingest loop and never silently vanishes — it
    * flows to the second stream, where a production deployment counts
    * or dead-letters it. The corrupt branch keeps `doc_id` in its
    * projection so the scan never references ONLY the internal corrupt
    * column (which Spark disallows on unparsed-file sources). */
  def curatedJsonlStream(spark: SparkSession, dir: String, qmin: Double = 0.4,
                         watermark: String = "1 hour",
                         window: String = "1 hour"): (DataFrame, DataFrame) = {
    val raw = graft.io.JsonLines.readStream(spark, dir, JsonlDocSchema)
    val clean = raw.filter(col(graft.io.JsonLines.CorruptCol).isNull)
      .drop(graft.io.JsonLines.CorruptCol)
    val bad = raw.filter(col(graft.io.JsonLines.CorruptCol).isNotNull)
      .select(col("doc_id"), col(graft.io.JsonLines.CorruptCol))
    (curatedStream(clean, qmin, watermark, window), bad)
  }
}
