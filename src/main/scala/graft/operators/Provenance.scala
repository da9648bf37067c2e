package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus manifests — the data-versioning primitive a 100 TB pipeline
  * needs before anything else: a compact, deterministic fingerprint of
  * corpus content that two snapshots (or two clusters, or engine
  * versions) can compare WITHOUT moving the corpus. Beyond-reference
  * scope (SURVEY §7.5), same role as parquet column statistics but
  * content-addressed.
  *
  * Shape: per id-bucket, a row-order-independent XOR of per-row content
  * hashes plus count/min/max/bytes. XOR is commutative (no sort, no
  * window), overflow-free (unlike a 60-bit hash SUM, which would wrap
  * differently in engines with 128-bit accumulators), and mergeable —
  * partial manifests from independent file groups combine by XOR, so
  * incremental re-manifest of an appended corpus touches only new
  * files. A changed/dropped/duplicated row flips its bucket's
  * signature; count+bytes catch the pair-cancellation blind spot
  * (XOR of an even number of identical rows).
  *
  * Scale: one narrow map pass + a `buckets`-row aggregate; the manifest
  * is O(buckets) however big the corpus is.
  */
object Provenance extends ProvenanceGateOps {

  /** q70: bucketed content manifest of the documents table. */
  def q70Manifest(documents: DataFrame, buckets: Int = 64): DataFrame =
    documents
      .select(
        pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        col("doc_id"),
        conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))), 1, 15), 16, 10)
          .cast("long").as("h"),
        col("n_chars"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("content_sig"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"),
        sum("n_chars").as("sum_chars"))
      .orderBy("bucket")

  def q70Sql(buckets: Int = 64): String =
    s"""WITH h AS (SELECT doc_id % $buckets AS bucket, doc_id,
       |             CAST(concat('0x', substr(md5(concat_ws('|', doc_id, text)), 1, 15))
       |               AS BIGINT) AS h,
       |             n_chars
       |           FROM documents)
       |SELECT bucket, count(*) AS n_docs, bit_xor(h) AS content_sig,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The XOR-OUT partial manifest of RETRACTED docs — the q117
    * takedown leg on the q112 manifest series: XOR is self-inverse, so
    * appending this partial to a per-tick manifest store makes
    * [[mergeManifests]] cancel each retracted doc's signature
    * contribution exactly, while the negated count/bytes subtract.
    * min_id/max_id are NULL (merge's min/max ignore them): after a
    * retraction the merged bounds are CONSERVATIVE — still valid
    * bounds on the remaining ids, not necessarily tight when the
    * retracted doc was bucket-extremal (recomputing a tight bound
    * would need the corpus, which manifests exist to avoid touching;
    * RetractionSpec pins exact n_docs/content_sig/sum_chars and the
    * bound property). */
  def retractionManifest(docs: DataFrame, buckets: Int = 64): DataFrame =
    docs
      .select(
        pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        contentHash60(concat_ws("|", col("doc_id"), col("text"))).as("h"),
        col("n_chars"))
      .groupBy("bucket")
      .agg(
        (-count(lit(1))).as("n_docs"),
        expr("bit_xor(h)").as("content_sig"),
        lit(null).cast("long").as("min_id"),
        lit(null).cast("long").as("max_id"),
        (-sum("n_chars")).as("sum_chars"))

  /** Batch-membership modulus for q73: doc_id % 17 == 0 plays the
    * incoming batch (~6 %), the rest plays the already-ingested corpus —
    * deterministic, engine-portable, and coprime to GenData's planting
    * strides so the batch catches planted duplicates. */
  val BatchMod = 17L

  /** q73: INCREMENTAL exact dedup — the ingestion-time shape of q21.
    * A full re-dedup of corpus+batch rescans everything ever ingested;
    * the incremental form joins the new batch against the corpus's
    * persisted CONTENT-HASH STATE only: per new doc, is its 60-bit text
    * hash already present? Output is the per-source admission report
    * (n_batch / n_dup / n_new) a pipeline logs every ingest tick.
    *
    * Scale shape: the corpus state is 8-byte hashes — ~0.01 % of a
    * 100 TB corpus — partitioned once by hash and reused across ticks;
    * the batch (≪ corpus) hashes map-side and joins LEFT against the
    * state on the hash key. AQE broadcasts the batch side at runtime
    * (pinned in PlanShapeSpec), so the corpus state is probed in place:
    * no shuffle of either side grows with corpus size. Text never moves:
    * both sides reduce to hashes before the join. */
  /** The shared 60-bit content hash (md5-first-15-hex) of a text column
    * — the unit of both the q73 corpus state and the persisted
    * [[graft.io.ArtifactStore]] corpus-hash artifact. */
  def contentHash60(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** The corpus's persisted content-hash state: one distinct 60-bit
    * hash per already-ingested document — ~0.01 % of the corpus bytes. */
  def corpusHashState(corpusDocs: DataFrame): DataFrame =
    corpusDocs.select(contentHash60(col("text")).as("ch")).distinct()

  /** DOC-GRANULAR hash state: (doc_id, ch) per ingested document — the
    * retraction-capable layout [[graft.io.IngestLoop]] stores (r10
    * verdict item 1). The distinct-ch projection of these rows is the
    * exact [[corpusHashState]] relation the admission join probes; the
    * doc_id is what makes a TAKEDOWN removable at document granularity:
    * retracting one of two ingested docs that share a hash (base-corpus
    * exact dups) must keep the hash — a hash-keyed tombstone would
    * over-remove it. ~16 bytes/doc instead of 8: still ~0.02 % of the
    * corpus. */
  def corpusDocHashes(corpusDocs: DataFrame): DataFrame =
    corpusDocs.select(col("doc_id"), contentHash60(col("text")).as("ch"))

  /** Per-source admission report of a batch against an existing hash
    * state (`ch` column) — the q73 kernel, factored out so the state can
    * come from a live computation OR a loaded artifact parquet. */
  def admissionReport(batchDocs: DataFrame, state: DataFrame): DataFrame =
    batchDocs
      .select(col("source"), contentHash60(col("text")).as("h"))
      .join(state, col("h") === col("ch"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_batch"),
           count(col("ch")).as("n_dup"),
           (count(lit(1)) - count(col("ch"))).as("n_new"))
      .orderBy("source")

  def q73IncrementalDedup(documents: DataFrame): DataFrame =
    admissionReport(
      documents.filter(pmod(col("doc_id"), lit(BatchMod)) === 0),
      corpusHashState(documents.filter(pmod(col("doc_id"), lit(BatchMod)) =!= 0)))

  def q73Sql: String =
    s"""WITH h AS (SELECT doc_id, source,
       |             CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
       |           FROM documents),
       |b AS (SELECT source, h FROM h WHERE doc_id % $BatchMod = 0),
       |c AS (SELECT DISTINCT h FROM h WHERE doc_id % $BatchMod <> 0)
       |SELECT b.source, count(*) AS n_batch, count(c.h) AS n_dup,
       |  count(*) - count(c.h) AS n_new
       |FROM b LEFT JOIN c ON b.h = c.h
       |GROUP BY b.source ORDER BY source""".stripMargin

  /** q92: FUZZY incremental admission — q73's exact-hash gate plus the
    * near-duplicate rejection a real ingest tick needs (the r8 verdict's
    * top item): a batch doc that paraphrases / lightly edits an
    * already-ingested corpus doc shares no content hash, so q73 admits
    * it; here it additionally collides with the corpus's MinHash-LSH
    * band state and is exact-verified against that candidate only.
    * Per-doc verdict precedence: `dup_corpus_exact` (content hash in
    * corpus state — trivially also a jaccard-1 LSH pair, so exact wins
    * the tie) → `dup_corpus_fuzzy` (verified cross Jaccard ≥ threshold)
    * → `new`. Output: the per-source admission report, one column per
    * verdict.
    *
    * Scale shape: everything the corpus contributes is persistable
    * 8–26-byte state (content hashes, band rows, shingle hashes — see
    * [[Fuzzy.corpusBandState]] / [[graft.io.ArtifactStore]]); the batch
    * derives its own hashes and bands map-side; candidates are band
    * equi-join collisions and exact verification is candidate-driven
    * (the q27/q88 shape) — corpus TEXT is never read at admission time
    * in the state-backed form
    * ([[graft.io.ArtifactStore.fuzzyAdmissionAgainstStore]]), and this
    * query's live form computes the identical relation from the same
    * table so the DuckDB oracle can re-derive it. The oracle reuses the
    * ONE q27 LSH chain and filters to side-crossing pairs — the q88
    * equivalence argument verbatim. */
  /** The q92 report kernel over any exact-hash state (`ch` column) and
    * fuzzy-flagged id set (`fid` column) — shared by the live q92 and
    * the persisted-state form
    * ([[graft.io.ArtifactStore.fuzzyAdmissionAgainstStore]]). Both
    * joins are ≤1-match (state distinct on ch, fid distinct), so the
    * batch row count is preserved and the three verdict columns
    * partition n_batch. */
  def fuzzyAdmissionReport(batchDocs: DataFrame, state: DataFrame,
                           fuzzyIds: DataFrame): DataFrame =
    batchDocs
      .select(col("doc_id"), col("source"), contentHash60(col("text")).as("h"))
      .join(state, col("h") === col("ch"), "left")
      .join(fuzzyIds.select(col("fid")), col("doc_id") === col("fid"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_batch"),
           count(col("ch")).as("n_dup_exact"),
           count(when(col("ch").isNull, col("fid"))).as("n_dup_fuzzy"),
           count(when(col("ch").isNull && col("fid").isNull, lit(1))).as("n_new"))
      .orderBy("source")

  def q92FuzzyAdmission(documents: DataFrame,
                        threshold: Double = 0.2): DataFrame = {
    val isBatch = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(BatchMod)) === 0
    val state = corpusHashState(documents.filter(!isBatch(col("doc_id"))))
    val fuzzy = Fuzzy.lshCrossPairs(documents, isBatch, threshold)
      .select(col("eval_id").as("fid")).distinct()
    fuzzyAdmissionReport(documents.filter(isBatch(col("doc_id"))), state, fuzzy)
  }

  def q92Sql(threshold: Double = 0.2): String =
    s"""WITH ${Fuzzy.lshPairsSqlCtes(
         "tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents)",
         threshold)},
       |h AS (SELECT doc_id, source,
       |        CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
       |      FROM documents),
       |b AS (SELECT doc_id, source, h FROM h WHERE doc_id % $BatchMod = 0),
       |c AS (SELECT DISTINCT h FROM h WHERE doc_id % $BatchMod <> 0),
       |fz AS (SELECT DISTINCT CASE WHEN ida % $BatchMod = 0 THEN ida ELSE idb END AS fid
       |       FROM pairs WHERE (ida % $BatchMod = 0) <> (idb % $BatchMod = 0))
       |SELECT b.source, count(*) AS n_batch, count(c.h) AS n_dup_exact,
       |  count(CASE WHEN c.h IS NULL THEN fz.fid END) AS n_dup_fuzzy,
       |  count(CASE WHEN c.h IS NULL AND fz.fid IS NULL THEN 1 END) AS n_new
       |FROM b LEFT JOIN c ON b.h = c.h
       |LEFT JOIN fz ON fz.fid = b.doc_id
       |GROUP BY b.source ORDER BY source""".stripMargin


  /** q75: manifest DIFF — the consumer of q70's manifests: given two
    * corpus snapshots, which id-buckets changed, and how? This is how
    * two 100 TB snapshots are compared WITHOUT moving either corpus:
    * each side reduces to its O(buckets) manifest independently (on its
    * own cluster, in its own datacenter), and the diff is a joined scan
    * of two tiny tables. Output: one row per bucket that differs, with
    * the count delta and a change class — 'grown' (docs added),
    * 'shrunk' (docs removed), 'mutated' (same count, different content
    * signature: an in-place edit XOR flips the signature).
    *
    * Snapshot A here is the q73 corpus (doc_id % BatchMod != 0) and
    * snapshot B the full table — so the diff is exactly "what did this
    * ingest tick change", and the planted duplicates make 'grown'
    * buckets with unchanged-vs-flipped signatures both occur. */
  /** Generic two-snapshot diff: any two document tables, compared via
    * their manifests only. 'mutated' (same count, flipped signature —
    * an in-place edit) is reachable here; q75's ingest-tick
    * specialization can only grow. */
  def manifestDiff(beforeDocs: DataFrame, afterDocs: DataFrame,
                   buckets: Int = 64): DataFrame = {
    val before = q70Manifest(beforeDocs, buckets)
      .select(col("bucket"), col("n_docs").as("n_before"),
        col("content_sig").as("sig_before"))
    val after = q70Manifest(afterDocs, buckets)
      .select(col("bucket").as("bucket_b"), col("n_docs").as("n_after"),
        col("content_sig").as("sig_after"))
    before
      .join(after, col("bucket") === col("bucket_b"), "full")
      // null-safe signature compare BEFORE projecting the sigs away:
      // a bucket present on one side only is a change (other sig null)
      .filter(!(col("sig_before") <=> col("sig_after")) ||
        !(col("n_before") <=> col("n_after")))
      .select(
        coalesce(col("bucket"), col("bucket_b")).as("bucket"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .withColumn("delta", col("n_after") - col("n_before"))
      .withColumn("change",
        when(col("delta") > 0, lit("grown"))
          .when(col("delta") < 0, lit("shrunk"))
          .otherwise(lit("mutated")))
      .orderBy("bucket")
  }

  def q75ManifestDiff(documents: DataFrame, buckets: Int = 64): DataFrame =
    manifestDiff(
      documents.filter(pmod(col("doc_id"), lit(BatchMod)) =!= 0),
      documents, buckets)

  def q75Sql(buckets: Int = 64): String =
    s"""WITH hb AS (SELECT doc_id % $buckets AS bucket,
       |              CAST(concat('0x', substr(md5(concat_ws('|', doc_id, text)), 1, 15))
       |                AS BIGINT) AS h
       |            FROM documents WHERE doc_id % $BatchMod <> 0),
       |before_m AS (SELECT bucket, count(*) AS n_before, bit_xor(h) AS sig_before
       |             FROM hb GROUP BY bucket),
       |ha AS (SELECT doc_id % $buckets AS bucket,
       |              CAST(concat('0x', substr(md5(concat_ws('|', doc_id, text)), 1, 15))
       |                AS BIGINT) AS h
       |            FROM documents),
       |after_m AS (SELECT bucket, count(*) AS n_after, bit_xor(h) AS sig_after
       |            FROM ha GROUP BY bucket)
       |SELECT coalesce(b.bucket, a.bucket) AS bucket,
       |  coalesce(b.n_before, 0) AS n_before,
       |  coalesce(a.n_after, 0) AS n_after,
       |  coalesce(a.n_after, 0) - coalesce(b.n_before, 0) AS delta,
       |  CASE WHEN coalesce(a.n_after, 0) > coalesce(b.n_before, 0) THEN 'grown'
       |       WHEN coalesce(a.n_after, 0) < coalesce(b.n_before, 0) THEN 'shrunk'
       |       ELSE 'mutated' END AS change
       |FROM before_m b FULL JOIN after_m a ON b.bucket = a.bucket
       |WHERE b.sig_before IS DISTINCT FROM a.sig_after
       |   OR b.n_before IS DISTINCT FROM a.n_after
       |ORDER BY bucket""".stripMargin

}
