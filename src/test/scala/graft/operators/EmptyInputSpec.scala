package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input safety: every operator shape that has historically
  * crashed engines on zero rows — scalar barriers (percentile → null),
  * aggregates that divide, windows over nothing, joins with an empty
  * side — must return an empty (or all-null scalar) result, not throw.
  * A 100 TB pipeline hits empty partitions and empty filter results
  * constantly; operators that assume rows exist are latent outages. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def empty(table: String): DataFrame =
    Tables.load(spark, sf, table).filter(lit(false))

  test("row-returning operators yield zero rows on empty input, no throw") {
    val zeroRow: Seq[(String, DataFrame)] = Seq(
      "q14_window_rank" -> Relational.q14WindowRank(empty("orders")),
      "q21_exact_dedup" -> TextOps.q21ExactDedup(empty("documents")),
      "q22_ngram_jaccard" -> TextOps.q22NgramJaccard(empty("documents")),
      "q56_dedup_clusters" -> TextOps.q56DedupClusters(empty("documents")),
      "q24_cosine_topk" -> VectorOps.q24CosineTopk(empty("embeddings")),
      "q27_lsh_dedup" -> Fuzzy.q27LshDedup(empty("documents")),
      "q34_emb_dedup" -> VectorOps.q34EmbeddingDedup(empty("embeddings")),
      "q54_bucketed_emb_dedup" -> VectorOps.q54BucketedEmbDedup(empty("embeddings")),
      "q36_asof_join" -> TemporalJoins.q36AsofJoin(empty("events")),
      "q39_winnow" -> Fuzzy.q39Winnow(empty("documents")),
      "q40_corpus_curate" -> Curate.q40CorpusCurate(empty("documents")),
      "q43_pivot" -> Relational3.q43Pivot(empty("events")),
      "q44_moving_avg" -> Relational3.q44MovingAvg(empty("orders")),
      "q45_edit_distance" -> Relational3.q45EditDistance(empty("part")),
      "q47_tfidf" -> TfIdf.q47Tfidf(empty("documents")),
      "q48_chunk" -> Chunking.q48Chunk(empty("documents")),
      "q50_cohort" -> Funnels.q50Cohort(empty("events")),
      "q72_rplsh_dedup" -> RpLsh.q72RplshDedup(empty("embeddings")),
      "q73_incremental_dedup" -> Provenance.q73IncrementalDedup(empty("documents")),
      "q74_lsh_recall" -> Fuzzy.q74LshRecall(empty("documents")),
      "q75_manifest_diff" -> Provenance.q75ManifestDiff(empty("documents")),
      "q76_emb_dedup_recall" -> VectorOps.q76EmbDedupRecall(empty("embeddings")),
      "q77_lm_perplexity" -> LmScore.q77LmPerplexity(empty("documents")),
      "q78_pii_scrub" -> PiiScrub.q78PiiScrub(empty("documents")),
      "q79_source_divergence" -> MixStats.q79SourceDivergence(empty("documents")),
      "q80_source_jaccard" -> MixStats.q80SourceJaccard(empty("documents")),
      "q81_quality_calibration" -> LmScore.q81QualityCalibration(empty("documents")),
      "q83_label_drift" -> VectorOps.q83LabelDrift(empty("embeddings")),
      "q86_substring_dups" -> SubstringDedup.q86SubstringDups(empty("documents")),
      "q87_pq_recall" -> Pq.q87PqRecall(empty("embeddings")),
      "q88_fuzzy_decontam" -> Contamination.q88FuzzyDecontam(empty("documents")),
      "q89_lang_fertility" -> Bpe.q89LangFertility(empty("documents")),
      "q90_boilerplate" -> SubstringDedup.q90Boilerplate(empty("documents")),
      "q92_fuzzy_admission" -> Provenance.q92FuzzyAdmission(empty("documents")),
      "q93_boilerplate_strip" -> SubstringDedup.q93BoilerplateStrip(empty("documents")),
      "q94_ivfpq_recall" -> Pq.q94IvfPqRecall(empty("embeddings")),
      "q96_bm25_topk" -> Retrieval.q96Bm25Topk(empty("documents")),
      "q97_temperature_mix" -> Curate.q97TemperatureMix(empty("documents")),
      "q98_cluster_canon" -> TextOps.q98ClusterCanon(empty("documents")),
      "q99_seq_length_stats" -> Packing.q99SeqLengthStats(empty("documents")),
      "q100_distinct_ngrams" -> TextOps.q100DistinctNgrams(empty("documents")),
      "q101_learned_filter" -> QualityModel.q101LearnedFilter(empty("documents")),
      "q102_shard_manifest" -> Sharding.q102ShardManifest(empty("documents")),
      "q103_admission_gate" -> Provenance.q103AdmissionGate(empty("documents")),
      "q106_multi_tick_ingest" -> Provenance.q106MultiTickIngest(empty("documents")),
      "q107_ivfpq_residual" -> Pq.q107IvfPqResidual(empty("embeddings")),
      "q108_packed_shards" -> Packing.q108PackedShards(empty("documents")),
      "q109_retrain_canary" -> QualityModel.q109RetrainCanary(empty("documents")),
      "q110_image_dedup" -> graft.multimodal.Multimodal.q110ImageDedup(empty("documents")),
      "q111_drift_series" -> Provenance.q111DriftSeries(empty("documents")),
      "q112_manifest_series" -> Provenance.q112ManifestSeries(empty("documents")),
      "q113_adaptive_ingest" -> Provenance.q113AdaptiveIngest(empty("documents")),
      "q114_image_admission" -> graft.multimodal.Multimodal.q114ImageAdmission(empty("documents")),
      "q115_fertility_drift" -> Bpe.q115FertilityDrift(empty("documents")),
      "q116_audio_dedup" -> graft.multimodal.Multimodal.q116AudioDedup(empty("documents")))
    zeroRow.foreach { case (name, df) =>
      assert(df.count() === 0L, s"$name on empty input")
    }
  }

  test("scalar aggregates return one all-null/zero row on empty input") {
    val spearman = RankStats.q38Spearman(empty("lineitem")).head()
    assert(spearman.getLong(0) === 0L)
    assert(spearman.isNullAt(1), "corr of nothing must be null")

    val funnel = Funnels.q49Funnel(empty("events"))
    assert(funnel.count() === 0L || funnel.head().getLong(0) === 0L)

    val kmv = Sketches.q46KmvDistinct(empty("lineitem")).head()
    assert(kmv.getLong(0) === 0L, "k of empty sketch")
    assert(kmv.isNullAt(1) && kmv.isNullAt(2), "estimate of nothing must be null")
    assert(kmv.getLong(3) === 0L)

    // q82 is a global agg per level: 3 rows, zero counts, null rate
    val novelty = Novelty.q82NgramNovelty(empty("documents")).collect()
    assert(novelty.length === 3)
    novelty.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
      assert(r.isNullAt(3), "novelty of an empty val set must be null")
    }

    // q84 always reports its 7 stages; an empty corpus means all-zero
    // accounting (and an empty pack), never a throw
    val v2 = CurateV2.q84CurationPipeline(
      empty("documents"), empty("embeddings")).collect()
    assert(v2.length === 7)
    v2.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L &&
        r.getLong(4) === 0L && r.getLong(5) === 0L,
        s"stage ${r.getInt(0)} non-zero on empty corpus")
    }
    assert(v2(6).getLong(6) === 0L, "ceil(0/seqLen) sequences")
    // q91 likewise: all nine stages, all-zero accounting
    val v3 = CurateV2.q91CurationV3(
      empty("documents"), empty("embeddings")).collect()
    assert(v3.length === 9)
    v3.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L &&
        r.getLong(4) === 0L && r.getLong(5) === 0L,
        s"v3 stage ${r.getInt(0)} non-zero on empty corpus")
    }
    assert(v3(8).getLong(6) === 0L)
  }
}
