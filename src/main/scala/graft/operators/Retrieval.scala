package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval — the BM25 ranking function (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond") over an inverted-index relation. The training-data use is
  * retrieval-shaped curation: for every held-out eval doc, surface the
  * training docs BM25 considers closest — the lexical complement to
  * q88's shingle-overlap leakage scan (BM25 finds topical/partial
  * matches that clear n-gram and MinHash thresholds) and the retrieval
  * kernel a RAG pipeline runs verbatim.
  *
  * No reference analogue (beyond-reference LLM-pipeline operator).
  *
  * Determinism discipline (the LmScore/PQ convention): each (query,
  * doc, term) contribution — idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  * — is rounded ONCE to integer micro-units; per-pair scores are exact
  * long sums of those micro-units, so the cross-engine result cannot
  * depend on float summation order. Ranking: (score_micro desc,
  * doc_id) — the rounded-key tiebreak discipline q47 established. The
  * residual exposure is the documented libm class: ln/÷ landing within
  * ~1e-16 of a 0.5-micro-unit boundary.
  *
  * Scale shape: the query side is the eval suite — small no matter the
  * corpus — so its distinct-term set BROADCASTS to the posting table
  * (the q66 bench-grams argument) and the corpus-side tf/dl tables
  * never ride a query-driven shuffle; the one large shuffle is the
  * (query_id, doc_id) score aggregation, bounded by posting-list
  * length. Terms whose df exceeds `maxDfFrac`·N are pruned BEFORE the
  * posting join (their idf ≈ 0 and their posting lists are the whole
  * corpus — the stopword blowup); the prune is mirrored in the oracle.
  * Because the harness realizes "the eval suite" as a FIXED FRACTION
  * of the corpus (doc_id % benchMod), the query side would otherwise
  * grow with N and the (query × posting) relation quadratically — the
  * round-9 gen-sf1 rehearsal measured exactly that (23× for 10× data)
  * — so the query side is additionally CAPPED at `maxQueries`
  * hash-ranked eval docs (the q59/Kmeans bounded-sample discipline,
  * cap mirrored in the oracle): a real eval suite is O(1k) queries
  * whatever the corpus size, and with the cap the factor is linear.
  *
  * Terms are word BIGRAMS (the phrase-index shape): selective under
  * Zipf where the unigram head is all stopwords — on the synthetic
  * corpus the unigram vocabulary is ~31 terms with median df at 78 %
  * of the corpus (every term would be pruned or near-zero-idf), while
  * bigrams give a ~900-term vocabulary with median df ~6 %. Real
  * corpora keep the same ordering, just less extreme.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  val DefaultMaxQueries = 256

  /** The persistable inverted-index relations: per-(doc, term) counts,
    * per-doc lengths, per-term document frequencies joined with the
    * one-row corpus stats. This IS corpus state (the q73-hash-state
    * argument applied to retrieval): built once per snapshot, probed by
    * every query tick — [[graft.io.ArtifactStore.bm25IndexOrBuild]]
    * persists exactly these three frames fingerprint-keyed. */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame, df: DataFrame)

  /** Observable build counter (the Kmeans.trainRuns pattern): the
    * ArtifactStore load path must leave it unchanged. */
  val indexBuilds = new java.util.concurrent.atomic.AtomicLong

  /** Observable tokenize counter: every corpus-text tokenization pass
    * increments it once — the incremental index's receipt that old
    * ticks are never re-tokenized (Bm25IncrementalSpec pins it). */
  val tokenizeRuns = new java.util.concurrent.atomic.AtomicLong

  // size < 2 guard: sequence(0, -1) counts DOWN in Spark, which would
  // fabricate null bigrams where DuckDB's range(1, 1) is empty
  private def bigrams = expr(
    """if(size(a) < 2, cast(array() as array<string>),
      |   transform(sequence(0, size(a) - 2),
      |             i -> concat(a[i], ' ', a[i + 1])))""".stripMargin)

  /** One batch of docs tokenized to its per-(doc, term) tf relation —
    * the unit the INCREMENTAL index appends
    * ([[graft.io.ArtifactStore.Bm25IncrementalIndex]]): the only thing
    * that ever reads text. Expects docs the admission layer already
    * verdicted `new` (a re-appended doc_id would double its postings —
    * the loop's exact gate exists to prevent exactly that). */
  def tfOf(docs: DataFrame): DataFrame = {
    tokenizeRuns.incrementAndGet()
    docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(bigrams).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
  }

  /** Index relations re-derived from a stored tf relation WITHOUT
    * touching text: dl = Σ tf per doc (every bigram occurrence is a tf
    * count), df = per-term row count, stats = O(1) aggregate — the same
    * derivations [[graft.io.ArtifactStore.bm25IndexOrBuild]] applies to
    * its tf parquet, so a tf accumulated across ingest ticks yields the
    * exact full-rebuild index (Bm25IncrementalSpec pins the ranking). */
  def indexFromTf(tf: DataFrame): Bm25Index = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
    Bm25Index(tf, dl, df)
  }

  /** Build the index relations from a corpus frame. */
  def index(corpus: DataFrame): Bm25Index = {
    indexBuilds.incrementAndGet()
    val toks = corpus
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(bigrams).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // one row: corpus size + average doc length (exact long sum / count)
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
    Bm25Index(tf, dl, df)
  }

  /** BM25 top-k over an index (live-built or artifact-loaded) for a
    * query frame exposing (doc_id, text). */
  def topkFromIndex(idx: Bm25Index, queries: DataFrame, topK: Int = 3,
                    maxDfFrac: Double = 0.2,
                    maxQueries: Int = DefaultMaxQueries): DataFrame = {
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    // bounded hash-ranked query sample (TakeOrdered heap at scale);
    // a no-op whenever the eval slice is within the cap
    val qterms = queries
      .withColumn("hv", hv).orderBy("hv", "doc_id").limit(maxQueries)
      .select(col("doc_id").as("query_id"), split(col("text"), " ").as("a"))
      .select(col("query_id"), explode(array_distinct(bigrams)).as("t"))
    // df stats restricted to the bounded query-term set BEFORE the
    // broadcast (r9 review): the pruned df table is still
    // vocabulary-sized — corpus-proportional — while only terms the
    // ≤ maxQueries query docs actually contain are ever scored
    val dfTab = idx.df.filter(col("df") <= col("n_docs") * maxDfFrac)
      .join(broadcast(qterms.select("t").distinct()), Seq("t"), "leftsemi")
    // contribution per (query, doc, term), micro-units, rounded ONCE
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    // broadcast term filters FIRST (r14 q96 watch item): the tf ⋈ dl
    // join shuffles on doc_id, and joining it first would shuffle the
    // FULL corpus-sized tf relation — every (doc, term) row — when only
    // rows carrying one of the ≤ maxQueries query docs' terms can ever
    // contribute. The two broadcast hash joins prune tf map-side with
    // zero shuffle, so the doc_id exchange moves the query-term slice
    // only (at corpus scale: the difference between shuffling the whole
    // posting relation and shuffling a query-sized sliver).
    val contrib = idx.tf
      .join(broadcast(qterms), "t")
      .join(broadcast(dfTab), "t")
      .join(idx.dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        round(idf * norm * 1e6).cast("long").as("cm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("smicro").desc, col("doc_id").asc)
    contrib.groupBy("query_id", "doc_id").agg(sum("cm").as("smicro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"),
        col("doc_id"), round(col("smicro") / 1e6, 6).as("score"))
      .orderBy("query_id", "rank")
  }

  /** q96: BM25 top-k training docs per held-out eval doc. */
  def q96Bm25Topk(documents: DataFrame, topK: Int = 3,
                  benchMod: Int = 50, benchRem: Int = 7,
                  maxDfFrac: Double = 0.2,
                  maxQueries: Int = DefaultMaxQueries): DataFrame = {
    val isBench = pmod(col("doc_id"), lit(benchMod.toLong)) === benchRem
    topkFromIndex(index(documents.filter(!isBench)),
      documents.filter(isBench), topK, maxDfFrac, maxQueries)
  }

  def q96Sql(topK: Int = 3, benchMod: Int = 50, benchRem: Int = 7,
             maxDfFrac: Double = 0.2,
             maxQueries: Int = DefaultMaxQueries): String =
    s"""WITH carr AS (
       |  SELECT doc_id, regexp_split_to_array(text, ' ') AS a
       |  FROM documents WHERE doc_id % $benchMod <> $benchRem),
       |toks AS (
       |  SELECT doc_id, a[i] || ' ' || a[i + 1] AS t
       |  FROM carr, unnest(range(1, len(a))) AS r(i)),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |dfx AS (SELECT t, count(*) AS df, any_value(n_docs) AS n_docs,
       |          any_value(avgdl) AS avgdl
       |        FROM tf, st GROUP BY t
       |        HAVING count(*) <= any_value(n_docs) * $maxDfFrac),
       |qarr AS (
       |  SELECT doc_id, regexp_split_to_array(text, ' ') AS a
       |  FROM documents WHERE doc_id % $benchMod = $benchRem
       |  ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS varchar)), 1, 15)) AS bigint),
       |    doc_id
       |  LIMIT $maxQueries),
       |qt AS (SELECT DISTINCT doc_id AS query_id, a[i] || ' ' || a[i + 1] AS t
       |       FROM qarr, unnest(range(1, len(a))) AS r(i)),
       |contrib AS (
       |  SELECT q.query_id, f.doc_id,
       |    CAST(round(ln(1.0 + (k.n_docs - k.df + 0.5) / (k.df + 0.5))
       |      * (f.tf * ${K1 + 1.0} /
       |         (f.tf + $K1 * (${1.0 - B} + $B * d.dl / k.avgdl))) * 1e6)
       |      AS BIGINT) AS cm
       |  FROM tf f
       |  JOIN dl d ON f.doc_id = d.doc_id
       |  JOIN qt q ON q.t = f.t
       |  JOIN dfx k ON k.t = f.t),
       |sc AS (SELECT query_id, doc_id, CAST(sum(cm) AS BIGINT) AS smicro
       |       FROM contrib GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, round(smicro / 1e6, 6) AS score
       |FROM (SELECT query_id, doc_id, smicro,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY smicro DESC, doc_id) AS rank
       |      FROM sc) r
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
}
