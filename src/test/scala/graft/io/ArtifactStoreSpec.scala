package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.TestSpark
import graft.operators.{Bpe, Kmeans, Pq, Provenance}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArtifactStore: train-or-load must be a pure cache — a persisted
  * artifact is served for the SAME CONTENT even from a different path
  * (the cold-JVM / second-cluster scenario: nothing in memory, only
  * bytes on disk + the corpus), training is provably skipped (trainRuns
  * counters), and the downstream queries are bit-identical either way.
  * The store's own artifacts are manifest-diffable with q75 machinery. */
class ArtifactStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Byte-copy a table's parquet to a fresh path: same content, new
    * inputFiles — the path-keyed JVM memo misses, so any skipped
    * training is attributable to the store's content fingerprint. */
  private def copyTable(table: String): String = {
    val dst = tmpDir(s"graft_copy_$table")
    Files.copy(Paths.get(s"$sf/$table.parquet"),
      Paths.get(s"$dst/$table.parquet"), StandardCopyOption.REPLACE_EXISTING)
    s"$dst/$table.parquet"
  }

  test("bpe: cold load from a copied corpus skips training; q35 is bit-identical") {
    val root = tmpDir("graft_artifacts_bpe")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val docsCopy = spark.read.parquet(copyTable("documents"))
    // non-default knobs: no other spec shares this memo key, so the
    // first call must train exactly once
    val t0 = Bpe.trainRuns.get()
    val ms1 = ArtifactStore.bpeMergesOrTrain(root, docs, nMerges = 12, trainDocs = 150L)
    assert(Bpe.trainRuns.get() === t0 + 1, "first call must train")
    assert(ms1.nonEmpty)
    val t1 = Bpe.trainRuns.get()
    val ms2 = ArtifactStore.bpeMergesOrTrain(root, docsCopy, nMerges = 12, trainDocs = 150L)
    assert(Bpe.trainRuns.get() === t1, "copied corpus must load, not retrain")
    assert(ms2 === ms1, "loaded merge table must equal the trained one")
    // bit-identity through the query surface: same artifact, same counts
    val a = docs.select(col("doc_id"), Bpe.tokenCount(ms1, col("text")).as("n"))
      .orderBy("doc_id").collect().toSeq
    val b = docsCopy.select(col("doc_id"), Bpe.tokenCount(ms2, col("text")).as("n"))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // default-knob artifact feeds the real q35 path via the memo preload
    ArtifactStore.bpeMergesOrTrain(root, docs)
    val tq = Bpe.trainRuns.get()
    ArtifactStore.bpeMergesOrTrain(root, docsCopy) // loads + preloads copy's memo key
    val q35a = Bpe.q35TokenCount(docs).collect().toSeq
    val q35b = Bpe.q35TokenCount(docsCopy).collect().toSeq
    assert(Bpe.trainRuns.get() === tq, "q35 on the copy must ride the loaded artifact")
    assert(q35a === q35b)
  }

  test("kmeans: cold load skips training; q54 is bit-identical") {
    val root = tmpDir("graft_artifacts_km")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val embCopy = spark.read.parquet(copyTable("embeddings"))
    val t0 = Kmeans.trainRuns.get()
    val c1 = ArtifactStore.centroidsOrTrain(root, emb, k = 6, iters = 2, trainN = 512)
    assert(Kmeans.trainRuns.get() === t0 + 1, "first call must train")
    assert(c1.length === 6 && c1.forall(_._2.nonEmpty))
    val t1 = Kmeans.trainRuns.get()
    val c2 = ArtifactStore.centroidsOrTrain(root, embCopy, k = 6, iters = 2, trainN = 512)
    assert(Kmeans.trainRuns.get() === t1, "copied corpus must load, not retrain")
    assert(c2 === c1, "loaded centroids must equal the trained ones")
    // default-knob artifact + preload → the real q54 path, bit-identical
    ArtifactStore.centroidsOrTrain(root, emb)
    val tq = Kmeans.trainRuns.get()
    ArtifactStore.centroidsOrTrain(root, embCopy)
    val a = graft.operators.VectorOps.q54BucketedEmbDedup(emb).collect().toSeq
    val b = graft.operators.VectorOps.q54BucketedEmbDedup(embCopy).collect().toSeq
    assert(Kmeans.trainRuns.get() === tq, "q54 on the copy must ride the loaded artifact")
    assert(a === b)
  }

  test("q73 corpus state: persisted artifact reproduces the live admission report") {
    val root = tmpDir("graft_artifacts_ch")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusSide = docs.filter(pmod(col("doc_id"), lit(Provenance.BatchMod)) =!= 0)
    val batchSide = docs.filter(pmod(col("doc_id"), lit(Provenance.BatchMod)) === 0)
    val live = Provenance.q73IncrementalDedup(docs).collect().toSeq
    val viaStore = ArtifactStore
      .admissionAgainstStore(root, corpusSide, batchSide).collect().toSeq
    assert(viaStore === live)
    // the state artifact is exactly the distinct corpus hashes
    val state = ArtifactStore.corpusHashesOrBuild(root, corpusSide)
    assert(state.count() === Provenance.corpusHashState(corpusSide).count())
    // second call serves the SAME artifact bytes (no rewrite): file
    // listing with sizes+mtimes is unchanged
    def listing(p: String) = {
      val dir = Paths.get(p)
      Files.walk(dir).toArray.map(_.toString).sorted
        .map(f => (f, Files.getLastModifiedTime(Paths.get(f)).toMillis))
        .toSeq
    }
    val before = listing(s"$root/corpus_hashes")
    ArtifactStore.corpusHashesOrBuild(root, corpusSide).count()
    assert(listing(s"$root/corpus_hashes") === before, "reload must not rewrite")
  }

  test("artifact evolution is manifest-diffable; listing sees every version") {
    val root = tmpDir("graft_artifacts_mf")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // a changed corpus changes the key — stale artifacts can't be
    // served for fresh data (the path-keyed-cache failure mode)
    assert(ArtifactStore.documentsFingerprint(docs) !==
      ArtifactStore.documentsFingerprint(docs.filter(col("doc_id") < 400)))
    // two versions side by side (different knobs → different keys; the
    // 8-merge table strictly extends the 5-merge one, so the diff is
    // guaranteed non-empty)
    ArtifactStore.bpeMergesOrTrain(root, docs, nMerges = 8, trainDocs = 150L)
    ArtifactStore.bpeMergesOrTrain(root, docs, nMerges = 5, trainDocs = 150L)
    val arts = ArtifactStore.listArtifacts(spark, root)
    assert(arts.size === 2 && arts.forall(_._1 === "bpe_merges"),
      s"expected two versioned bpe artifacts, got $arts")
    // the two versions diff like any two corpus snapshots: map the merge
    // tables to the (doc_id, text) shape and reuse the q75 machinery
    def asDocs(key: String) =
      spark.read.parquet(s"$root/bpe_merges/$key")
        .select(col("ord").cast("long").as("doc_id"), col("pair").as("text"),
          length(col("pair")).as("n_chars"))
    val diff = Provenance.manifestDiff(asDocs(arts(0)._2), asDocs(arts(1)._2),
      buckets = 8).collect()
    assert(diff.nonEmpty,
      "different corpora learn different merges; the manifest diff must see it")
    assert(diff.forall(r => Set("grown", "shrunk", "mutated")(r.getAs[String]("change"))))
  }

  test("bm25 index: built once, probed from parquet; stored ranking ≡ live q96") {
    import graft.operators.Retrieval
    val root = tmpDir("graft_artifacts_bm25")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val isBench = pmod(col("doc_id"), lit(50L)) === 7
    val corpus = docs.filter(!isBench)
    val queries = docs.filter(isBench)
    val live = Retrieval.q96Bm25Topk(docs).collect()
    val b0 = Retrieval.indexBuilds.get()
    val idx = ArtifactStore.bm25IndexOrBuild(root, corpus) // may build
    val built = Retrieval.indexBuilds.get()
    assert(built === b0 + 1)
    assert(ArtifactStore.listArtifacts(spark, root).exists(_._1 == "bm25_index"))
    // second call serves parquet without re-tokenizing the corpus
    val idx2 = ArtifactStore.bm25IndexOrBuild(root, corpus)
    assert(Retrieval.indexBuilds.get() === built, "load must not rebuild")
    val stored = Retrieval.topkFromIndex(idx2, queries).collect()
    assert(stored.toSeq === live.toSeq,
      "artifact-served ranking must be bit-identical to the live query")
  }

  test("q94 ivf-pq composes BOTH persisted artifacts cold, retraining nothing") {
    val root = tmpDir("graft_artifacts_ivfpq")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // persist both halves of the index once (may train here)
    ArtifactStore.centroidsOrTrain(root, emb)
    ArtifactStore.pqCodebooksOrTrain(root, emb)
    // cold path: same bytes, new path → the JVM memos miss, so serving
    // without training is attributable to the store alone
    val embCopy = spark.read.parquet(copyTable("embeddings"))
    val (k0, p0) = (Kmeans.trainRuns.get(), Pq.trainRuns.get())
    ArtifactStore.centroidsOrTrain(root, embCopy)
    ArtifactStore.pqCodebooksOrTrain(root, embCopy)
    assert(Kmeans.trainRuns.get() === k0, "centroids must load, not retrain")
    assert(Pq.trainRuns.get() === p0, "codebooks must load, not retrain")
    val out = Pq.q94IvfPqRecall(embCopy).collect()
    assert(Kmeans.trainRuns.get() === k0 && Pq.trainRuns.get() === p0,
      "q94 must compose the loaded artifacts, not retrain either half")
    assert(out.nonEmpty)
    val n = embCopy.count()
    out.foreach { r =>
      // pruning is real: the ADC scan touched a strict subset
      assert(r.getLong(1) > 0 && r.getLong(1) < n, s"n_cand for qid ${r.getLong(0)}")
      // exact re-rank of an ADC-superset shortlist can only help:
      // any exact-top-k member in the shortlist survives the re-rank
      assert(r.getDouble(5) >= r.getDouble(3),
        s"recall_rr < recall_adc for qid ${r.getLong(0)}")
    }
  }
}
