package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LEARNED byte-pair-encoding tokenizer — merge table trained on the
  * corpus itself, applied as a chain of codegen'd string replaces.
  * Replaces the regex stand-in ([[LangQuality.bpeTokens]], kept as the
  * cheap row-local mode for the composed q40/q58 pipelines) for the
  * three queries a real pipeline budgets context length with: q35
  * (token accounting), q67 (sequence packing), q69 (domain mixing).
  *
  * Representation: a document is one string where every non-space char
  * is a token wrapped in sentinel brackets — "spark" → "<s><p><a><r><k>"
  * — and spaces stay bare, so a pair pattern "<x><y>" can never span a
  * word boundary. (The corpus alphabet is [a-z ]; '<'/'>' cannot occur
  * in text.) A merge of pair "<x><y>" is then literally
  * `replace(s, "<x><y>", "<xy>")`: leftmost non-overlapping global
  * replace, which is exactly BPE's left-to-right merge application —
  * and a primitive with IDENTICAL semantics in Spark (StringReplace,
  * codegen'd) and DuckDB (replace), so the oracle can re-derive
  * training AND application without a UDF anywhere.
  *
  * Training (the classic Sennrich'16 loop): M iterations of
  *   1. count adjacent token pairs within words across the train set;
  *   2. take the (count desc, pair asc) argmax — one 1-row collect per
  *      iteration, the same documented scalar-barrier shape as q08's
  *      medians;
  *   3. append to the merge list (state is re-derived lazily as the
  *      fold of learned replaces — nothing but the argmax ever reaches
  *      the driver).
  * The train set is capped at `doc_id < trainDocs` (cap mirrored in the
  * oracle CTEs, per the repo's cap-mirroring rule): BPE statistics
  * saturate on a tiny fraction of any real corpus, so at 100 TB the
  * trainer reads a bounded sample while application stays a pure
  * map-side column over everything. Per-corpus merge tables are
  * memoized by input-file listing, so q35/q67/q69 train once per JVM.
  *
  * The DuckDB oracle unrolls the same M iterations as chained
  * MATERIALIZED CTEs (p_i: pair counts, b_i: argmax, s_i: state) — the
  * oracle SQL is static (independent of data), both engines train on
  * the same table, and every tie-break is binary string order in both.
  */
object Bpe {

  val DefaultMerges = 20
  val DefaultTrainDocs = 200L

  /** "<x><y>" → "<xy>": strip the inner bracket pair. */
  private def merged(pair: String): String = pair.replace("><", "")

  /** Wrap every non-space char as an angle-bracket token. */
  def encode(text: Column): Column =
    regexp_replace(text, "([^ ])", "<$1>")

  /** Train a merge table on `documents` rows with doc_id < trainDocs.
    * Returns merges in learned (priority) order. */
  def train(documents: DataFrame, nMerges: Int = DefaultMerges,
            trainDocs: Long = DefaultTrainDocs): Seq[String] =
    trainOn(documents.filter(col("doc_id") < trainDocs), nMerges)

  /** [[train]] over a HASH-RANKED bounded sample instead of the id
    * prefix — the snapshot-retrain form (q119): a retrain must SEE the
    * admitted docs, which an id-prefix cap on a grown corpus mostly
    * does not (admissions carry arbitrary ids), while a hash-ranked
    * sample draws uniformly from base ∪ admissions (the QualityModel/
    * Kmeans bounded-sample convention, mirrored in the oracle). */
  def trainHashSampled(documents: DataFrame, nMerges: Int = DefaultMerges,
                       sampleN: Long = DefaultTrainDocs): Seq[String] = {
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    trainOn(documents.withColumn("hv", hv).orderBy("hv", "doc_id")
      .limit(sampleN.toInt), nMerges)
  }

  private def trainOn(trainSet: DataFrame, nMerges: Int): Seq[String] = {
    trainRuns.incrementAndGet()
    val base = trainSet
      .select(encode(col("text")).as("s"))
      .cache()
    try {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      var done = false
      while (acc.length < nMerges && !done) {
        // state = fold of the merges learned so far (lazy; base stays
        // cached, the fold is O(#merges) codegen'd replaces per row)
        val state = base.select(
          acc.foldLeft(col("s"))((c, m) => replace(c, lit(m), lit(merged(m)))).as("s"))
        val best = state
          .select(explode(split(col("s"), " ")).as("w"))
          .select(expr("regexp_extract_all(w, '<[^>]*>', 0)").as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ts) - 1), " +
              "j -> concat(element_at(ts, j), element_at(ts, j + 1)))")).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1).collect()
        if (best.isEmpty) done = true // corpus exhausted; oracle's b_i
                                      // goes empty -> coalesce no-op
        else acc += best(0).getString(0)
      }
      acc.toSeq
    } finally { base.unpersist() }
  }

  // one merge table per distinct input-file set per JVM (q35/q67/q69
  // share the training run; spec-local in-memory frames skip the memo)
  private val memo = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  /** Count of actual training runs this JVM — the observable
    * [[graft.io.ArtifactStore]]'s cold-load spec pins (a loaded
    * artifact must leave this unchanged). */
  val trainRuns = new java.util.concurrent.atomic.AtomicLong

  /** Memo key = inputFiles + the analyzed plan's canonicalized hash +
    * params (+ optional scope) — the [[QualityModel]] slice-discriminator
    * discipline (r11, for q119's snapshot-trained table): a merge table
    * trained on a SLICE of the corpus must never alias the whole-table
    * artifact, even when the caller forgets `scope`. Same documented
    * trade-offs: preload narrowing + the ~2⁻³² plan-hash sliver. */
  private def memoKey(documents: DataFrame, nMerges: Int,
                      trainDocs: Long, scope: String): Option[String] = {
    val files = documents.inputFiles
    if (files.isEmpty) None
    else Some(files.sorted.mkString(",") +
      s"#${documents.queryExecution.analyzed.canonicalized.hashCode()}" +
      s"#$nMerges#$trainDocs#$scope")
  }

  /** Seed the memo with an externally-persisted merge table (the
    * ArtifactStore load path): subsequent [[merges]] calls for the same
    * corpus+hyperparams serve the artifact and never train. */
  def preload(documents: DataFrame, ms: Seq[String],
              nMerges: Int = DefaultMerges,
              trainDocs: Long = DefaultTrainDocs,
              scope: String = ""): Unit =
    memoKey(documents, nMerges, trainDocs, scope).foreach(memo.put(_, ms))

  /** Memoized merge table for a parquet-backed corpus. */
  def merges(documents: DataFrame, nMerges: Int = DefaultMerges,
             trainDocs: Long = DefaultTrainDocs,
             scope: String = ""): Seq[String] =
    memoKey(documents, nMerges, trainDocs, scope) match {
      case None      => train(documents, nMerges, trainDocs)
      case Some(key) => memo.getOrElseUpdate(key, train(documents, nMerges, trainDocs))
    }

  /** Memoized [[trainHashSampled]] (the "hs:" scope namespace keeps it
    * apart from id-prefix tables of the same corpus+params). */
  def mergesHashSampled(documents: DataFrame, nMerges: Int = DefaultMerges,
                        sampleN: Long = DefaultTrainDocs,
                        scope: String = ""): Seq[String] =
    memoKey(documents, nMerges, sampleN, s"hs:$scope") match {
      case None      => trainHashSampled(documents, nMerges, sampleN)
      case Some(key) =>
        memo.getOrElseUpdate(key, trainHashSampled(documents, nMerges, sampleN))
    }

  /** Learned-BPE token count of `text` under a trained merge table:
    * encode → fold of replaces → count '<' sentinels. Every step is a
    * codegen'd string primitive; the whole chain stays inside
    * whole-stage codegen. */
  def tokenCount(ms: Seq[String], text: Column): Column =
    graft.catalyst.native.bpeTokenCount(ms, text)

  /** The declarative replace-chain form of [[tokenCount]] — the
    * specification the native kernel and the DuckDB oracle both mirror
    * (BpeSpec pins all three equal). ~5× slower than the native pass
    * (21 intermediate strings per row); kept as the reference
    * semantics, not the hot path. */
  def tokenCountChain(ms: Seq[String], text: Column): Column = {
    val applied = ms.foldLeft(encode(text))((c, m) => replace(c, lit(m), lit(merged(m))))
    size(split(applied, lit("<"))) - 1
  }

  /** q35: token accounting, whitespace vs learned BPE; `fertility` =
    * subword tokens per word, the number a training pipeline budgets
    * context length with. `learned = false` keeps the round-4 regex
    * chunker mode. */
  def q35TokenCount(documents: DataFrame, learned: Boolean = true,
                    nMerges: Int = DefaultMerges): DataFrame = {
    val bpeCol =
      if (learned) tokenCount(merges(documents, nMerges), col("text"))
      else LangQuality.bpeTokens
    documents.select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        bpeCol.as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** q89: per-language tokenizer fertility — BPE tokens per whitespace
    * word, aggregated by the document's language tag. Fertility
    * disparity is the standard tokenizer-equity metric for a
    * multilingual corpus (a language at 2× fertility pays 2× context
    * and 2× compute per word); a curation loop reads this table before
    * fixing the merge budget or re-balancing the language mix (q69's
    * token budgets are denominated in exactly these units). Row-local
    * feature pass + one partial-aggregated groupBy on a low-cardinality
    * key: the 100 TB cost is the scan, as it must be. */
  def q89LangFertility(documents: DataFrame,
                       nMerges: Int = DefaultMerges): DataFrame = {
    val ms = merges(documents, nMerges)
    documents.select(col("lang"),
        size(split(col("text"), " ")).as("ws"),
        tokenCount(ms, col("text")).as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").cast("long").as("sum_ws_tokens"),
        sum("bpe").cast("long").as("sum_bpe_tokens"))
      .withColumn("fertility",
        round(col("sum_bpe_tokens").cast("double") / col("sum_ws_tokens"), 6))
      .orderBy("lang")
  }

  def q89Sql(nMerges: Int = DefaultMerges,
             trainDocs: Long = DefaultTrainDocs): String =
    s"""WITH ${tokenSqlCtes(nMerges, trainDocs)},
       |ws AS (SELECT doc_id, len(regexp_split_to_array(text, ' ')) AS ws
       |       FROM documents)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(ws.ws) AS BIGINT) AS sum_ws_tokens,
       |  CAST(sum(bt.n_tokens) AS BIGINT) AS sum_bpe_tokens,
       |  round(CAST(sum(bt.n_tokens) AS DOUBLE) / sum(ws.ws), 6) AS fertility
       |FROM documents d
       |JOIN bpe_tok bt USING (doc_id)
       |JOIN ws USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** q115: TOKENIZER FERTILITY DRIFT per ingest tick — the tokenizer's
    * q104: under the FROZEN corpus BPE merges (the q35/q67 artifact), is
    * what each tick ADMITS harder to tokenize than the base corpus?
    * Per tick slice (0 = base corpus, 1/2 = that tick's admissions —
    * the q106 admitted sets: dups and rejects never count), doc/token
    * totals, fertility (BPE per whitespace token), and the delta vs the
    * base slice. A rising delta says the merge table no longer fits the
    * incoming mix — the retrain-the-TOKENIZER signal, parallel to
    * q104/q109's for the quality model, and priced in exactly the units
    * q69's budgets spend.
    *
    * Scale shape: the shared q106 chain (checkpointed), one row-local
    * ws+BPE count pass over base ∪ admissions (merges fold in as an
    * expression chain — no UDF, no join), a 3-group aggregate, and a
    * broadcast-of-one-row baseline for the delta. */
  def q115FertilityDrift(documents: DataFrame, threshold: Double = 0.2,
                         lowFrac: Double = 0.25,
                         nMerges: Int = DefaultMerges,
                         trainDocs: Long = DefaultTrainDocs): DataFrame = {
    val (v1, v2, _) = Provenance.multiTickFrames(documents, threshold, lowFrac)
    val ms = merges(documents, nMerges, trainDocs)
    val ag = Provenance.ingestedMembership(documents, v1, v2)
      .withColumnRenamed("ft", "tick")
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("tick"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        tokenCount(ms, col("text")).cast("long").as("bpe"))
      .groupBy("tick")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_ws_tokens"), sum("bpe").as("n_bpe_tokens"))
      .localCheckpoint() // read by the baseline row and the report
    val f0 = ag.filter(col("tick") === 0)
      .select((col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
        .as("fert0"))
    ag.crossJoin(broadcast(f0))
      .select(col("tick"), col("n_docs"), col("n_ws_tokens"),
        col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
          .as("fertility"),
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens")
          - col("fert0"), 6).as("delta"))
      .orderBy("tick")
  }

  def q115Sql(threshold: Double = 0.2, lowFrac: Double = 0.25,
              nMerges: Int = DefaultMerges,
              trainDocs: Long = DefaultTrainDocs,
              iters: Int = QualityModel.DefaultIters,
              trainN: Int = QualityModel.DefaultTrainN): String = {
    val bm = Provenance.BatchMod
    s"""WITH ${Provenance.multiTickSqlCtes(threshold, lowFrac, iters, trainN)},
       |${tokenSqlCtes(nMerges, trainDocs)},
       |ftk AS (SELECT doc_id, 0 AS tick FROM documents
       |          WHERE doc_id % $bm BETWEEN 1 AND 9
       |        UNION ALL SELECT doc_id, 1 AS tick FROM v1 WHERE lq = false
       |        UNION ALL SELECT doc_id, 2 AS tick FROM v2 WHERE lq = false),
       |fx AS (SELECT f.tick,
       |         len(regexp_split_to_array(d.text, ' ')) AS ws,
       |         bt.n_tokens AS bpe
       |       FROM ftk f JOIN documents d ON d.doc_id = f.doc_id
       |       JOIN bpe_tok bt ON bt.doc_id = f.doc_id),
       |ag AS MATERIALIZED (SELECT tick, count(*) AS n_docs,
       |         CAST(sum(ws) AS BIGINT) AS n_ws_tokens,
       |         CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens
       |       FROM fx GROUP BY tick),
       |f0 AS (SELECT CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens AS fert0
       |       FROM ag WHERE tick = 0)
       |SELECT tick, n_docs, n_ws_tokens, n_bpe_tokens,
       |  round(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens, 6) AS fertility,
       |  round(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens - fert0, 6) AS delta
       |FROM ag, f0 ORDER BY tick""".stripMargin
  }

  /** q119: the TOKENIZER RETRAIN response — q115's consumer (r10
    * verdict item 3; the q113 shape for BPE): after tick 1's
    * admissions, RETRAIN the merge table on the post-tick ingested
    * snapshot (base corpus ∪ tick-1 admissions — never on rejects;
    * bounded HASH-RANKED sample, so the retrain actually sees admitted
    * docs — an id-prefix cap on a grown corpus would not),
    * measure both tokenizers on a bounded hash-ranked canary sample of
    * that snapshot, and GATE the choice: adopt the fresh merges iff
    * they save at least `minGainTokens` BPE tokens on the canary
    * (fewer tokens = the merges fit the incoming mix better — the
    * compression objective BPE trains for, priced in the exact units
    * q69's budgets spend). The tick-2 batch is then re-tokenized under
    * the CHOSEN merges — the accounting a budget-aware ingest loop
    * actually runs. Output rows: the canary measurement under both
    * tokenizers, then tick 2 under the chosen one — the choice itself
    * is re-derived by the oracle (a CASE over the two canary totals),
    * so a hash match certifies retrain ∘ canary ∘ gate ∘ re-tokenize.
    *
    * Oracle: TWO unrolled Sennrich training chains in one WITH clause
    * (the unprefixed artifact chain + the `nw_` snapshot chain — the
    * prefix machinery q113 proved for logreg, applied to BPE) + the
    * q106 core for the admitted set.
    *
    * Scale shape: the q106 chain (shared/checkpointed) + one more
    * bounded-sample training run + canary-sized (`evalN`) dual
    * tokenization + ONE scalar barrier (two token totals — a 2-long
    * row, the q113 flip-count shape) + a row-local re-tokenize of the
    * tick-2 batch. */
  def q119TokenizerRetrain(documents: DataFrame, threshold: Double = 0.2,
                           lowFrac: Double = 0.25,
                           nMerges: Int = DefaultMerges,
                           trainDocs: Long = DefaultTrainDocs,
                           evalN: Int = 256,
                           minGainTokens: Long = 1L): DataFrame = {
    val p = Provenance.multiTickParts(documents, threshold, lowFrac)
    val m = pmod(col("doc_id"), lit(Provenance.BatchMod))
    val corpus = documents.filter(m.between(1, 9))
    val adm1Docs = documents.join(
      p.v1.filter(col("lq") === false).select("doc_id"), Seq("doc_id"), "left_semi")
    val snapshot = corpus.union(adm1Docs)
    val msFrozen = merges(documents, nMerges, trainDocs) // the q35/q115 artifact
    val msFresh = mergesHashSampled(snapshot, nMerges, trainDocs,
      scope = s"snapshot${Provenance.BatchMod}")
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val canary = snapshot.withColumn("hv", hv).orderBy("hv", "doc_id")
      .limit(evalN).select("doc_id", "text").localCheckpoint()
    // the ONE scalar barrier: two exact token totals choose the merges
    val tots = canary.agg(
      sum(tokenCount(msFrozen, col("text")).cast("long")).as("tfz"),
      sum(tokenCount(msFresh, col("text")).cast("long")).as("tfr")).collect()(0)
    val adopt = tots.getLong(1) + minGainTokens <= tots.getLong(0)
    val chosen = if (adopt) msFresh else msFrozen
    val chosenLabel = if (adopt) "fresh" else "frozen"
    def slice(df: DataFrame, sliceName: String, label: String,
              ms: Seq[String]): DataFrame =
      df.select(size(split(col("text"), " ")).cast("long").as("ws"),
          tokenCount(ms, col("text")).cast("long").as("bpe"))
        .agg(count(lit(1)).as("n_docs"), sum("ws").as("n_ws_tokens"),
          sum("bpe").as("n_bpe_tokens"))
        .select(lit(sliceName).as("slice"), lit(label).as("tokenizer"),
          col("n_docs"), col("n_ws_tokens"), col("n_bpe_tokens"),
          round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
            .as("fertility"))
    slice(canary, "canary", "frozen", msFrozen)
      .union(slice(canary, "canary", "fresh", msFresh))
      .union(slice(documents.filter(m === 0), "tick2", chosenLabel, chosen))
      .orderBy("slice", "tokenizer")
  }

  def q119Sql(threshold: Double = 0.2, lowFrac: Double = 0.25,
              nMerges: Int = DefaultMerges,
              trainDocs: Long = DefaultTrainDocs,
              evalN: Int = 256, minGainTokens: Long = 1L,
              iters: Int = QualityModel.DefaultIters,
              trainN: Int = QualityModel.DefaultTrainN): String = {
    val bm = Provenance.BatchMod
    val snapRel = "(SELECT d.doc_id, d.text FROM documents d " +
      "JOIN csnap cs ON cs.doc_id = d.doc_id)"
    def cnt(x: String) = s"len($x) - len(replace($x, '<', ''))"
    s"""WITH ${Provenance.multiTickCoreSqlCtes(threshold, lowFrac, iters, trainN)},
       |csnap AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE doc_id % $bm BETWEEN 1 AND 9
       |  UNION ALL SELECT doc_id FROM adm1),
       |${sqlCtes(nMerges, trainDocs)},
       |${sqlCtes(nMerges, trainDocs, snapRel, "nw_", hashSampled = true)},
       |canary AS MATERIALIZED (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN csnap cs ON cs.doc_id = d.doc_id
       |  ORDER BY CAST(concat('0x', substr(md5(CAST(d.doc_id AS varchar)), 1, 15))
       |    AS BIGINT), d.doc_id
       |  LIMIT $evalN),
       |capp AS MATERIALIZED (
       |  SELECT doc_id, len(regexp_split_to_array(text, ' ')) AS ws,
       |    ${cnt("x1")} AS fz, ${cnt("x2")} AS fr
       |  FROM (SELECT doc_id, text,
       |          ${applySqlExpr("text", nMerges)} AS x1,
       |          ${applySqlExpr("text", nMerges, "nw_")} AS x2
       |        FROM canary) z),
       |ctot AS MATERIALIZED (SELECT count(*) AS n_docs,
       |  CAST(sum(ws) AS BIGINT) AS ws,
       |  CAST(sum(fz) AS BIGINT) AS tfz, CAST(sum(fr) AS BIGINT) AS tfr
       |  FROM capp),
       |ch AS (SELECT CASE WHEN tfr + $minGainTokens <= tfz
       |         THEN 'fresh' ELSE 'frozen' END AS tk FROM ctot),
       |t2app AS (SELECT len(regexp_split_to_array(text, ' ')) AS ws,
       |    ${cnt("x1")} AS fz, ${cnt("x2")} AS fr
       |  FROM (SELECT text,
       |          ${applySqlExpr("text", nMerges)} AS x1,
       |          ${applySqlExpr("text", nMerges, "nw_")} AS x2
       |        FROM documents WHERE doc_id % $bm = 0) z),
       |t2tot AS (SELECT ch.tk, count(*) AS n_docs,
       |    CAST(sum(ws) AS BIGINT) AS ws,
       |    CAST(sum(CASE WHEN ch.tk = 'fresh' THEN fr ELSE fz END) AS BIGINT)
       |      AS bpe
       |  FROM t2app, ch GROUP BY ch.tk),
       |r1 AS (SELECT 'canary' AS slice, 'frozen' AS tokenizer, n_docs,
       |         ws AS n_ws_tokens, tfz AS n_bpe_tokens,
       |         round(CAST(tfz AS DOUBLE) / ws, 6) AS fertility FROM ctot),
       |r2 AS (SELECT 'canary' AS slice, 'fresh' AS tokenizer, n_docs,
       |         ws AS n_ws_tokens, tfr AS n_bpe_tokens,
       |         round(CAST(tfr AS DOUBLE) / ws, 6) AS fertility FROM ctot),
       |r3 AS (SELECT 'tick2' AS slice, tk AS tokenizer, n_docs,
       |         ws AS n_ws_tokens, bpe AS n_bpe_tokens,
       |         round(CAST(bpe AS DOUBLE) / ws, 6) AS fertility FROM t2tot)
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
       |ORDER BY slice, tokenizer""".stripMargin
  }

  // ---- oracle SQL generation ------------------------------------------

  /** The unrolled training CTEs: s0 (encoded train set), then per
    * iteration i: p_i (pair counts), b_i (argmax), s_i (state after
    * applying b_i). MATERIALIZED pins linear evaluation — each s_i is
    * referenced twice (p_{i+1} and s_{i+1}), and inlining the chain
    * would blow up exponentially. `docs` names the training relation
    * and `p` prefixes every CTE (the CTE-namespace convention), so TWO
    * training chains — frozen artifact vs snapshot retrain — compose
    * into one WITH clause (q119). */
  def sqlCtes(nMerges: Int = DefaultMerges,
              trainDocs: Long = DefaultTrainDocs,
              docs: String = "documents", p: String = "",
              hashSampled: Boolean = false): String = {
    val trainRel =
      if (hashSampled)
        s"""(SELECT doc_id, text FROM $docs
           |   ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS varchar)), 1, 15))
           |     AS BIGINT), doc_id
           |   LIMIT $trainDocs)""".stripMargin
      else s"$docs WHERE doc_id < $trainDocs"
    val s0 =
      s"""${p}s0 AS MATERIALIZED (
         |  SELECT doc_id, regexp_replace(text, '([^ ])', '<\\1>', 'g') AS s
         |  FROM $trainRel)""".stripMargin
    val iters = (1 to nMerges).map { i =>
      s"""${p}p$i AS (
         |  SELECT u.p AS pair, count(*) AS c
         |  FROM ${p}s${i - 1}, UNNEST(flatten(list_transform(string_split(s, ' '), w ->
         |    list_transform(range(1, len(regexp_extract_all(w, '<[^>]*>'))),
         |      j -> regexp_extract_all(w, '<[^>]*>')[j] || regexp_extract_all(w, '<[^>]*>')[j+1])))) AS u(p)
         |  GROUP BY 1),
         |${p}b$i AS (SELECT pair FROM ${p}p$i ORDER BY c DESC, pair LIMIT 1),
         |${p}s$i AS MATERIALIZED (SELECT doc_id, replace(s,
         |  coalesce((SELECT pair FROM ${p}b$i), '@@'),
         |  coalesce((SELECT replace(pair, '><', '') FROM ${p}b$i), '@@')) AS s FROM ${p}s${i - 1})""".stripMargin
    }
    (s0 +: iters).mkString(",\n")
  }

  /** Application chain over an arbitrary text expression, as SQL: the
    * same fold of replaces, each merge read back from its `${p}b_i` CTE
    * (scalar subquery; coalesce makes an exhausted iteration a no-op,
    * matching the trainer's early stop). */
  def applySqlExpr(textExpr: String, nMerges: Int = DefaultMerges,
                   p: String = ""): String =
    (1 to nMerges).foldLeft(
      s"regexp_replace($textExpr, '([^ ])', '<\\1>', 'g')") { (acc, i) =>
      s"""replace($acc,
         |  coalesce((SELECT pair FROM ${p}b$i), '@@'),
         |  coalesce((SELECT replace(pair, '><', '') FROM ${p}b$i), '@@'))""".stripMargin
    }

  /** Per-doc learned token counts as a CTE named `bpe_tok(doc_id,
    * n_tokens)` — the shared oracle building block for q35/q67/q69. */
  def tokenSqlCtes(nMerges: Int = DefaultMerges,
                   trainDocs: Long = DefaultTrainDocs): String =
    s"""${sqlCtes(nMerges, trainDocs)},
       |bpe_app AS (SELECT doc_id, ${applySqlExpr("text", nMerges)} AS s FROM documents),
       |bpe_tok AS (SELECT doc_id, len(s) - len(replace(s, '<', '')) AS n_tokens
       |            FROM bpe_app)""".stripMargin

  def q35Sql(nMerges: Int = DefaultMerges,
             trainDocs: Long = DefaultTrainDocs): String =
    s"""WITH ${tokenSqlCtes(nMerges, trainDocs)}
       |SELECT d.doc_id,
       |  len(regexp_split_to_array(d.text, ' ')) AS n_ws_tokens,
       |  b.n_tokens AS n_bpe_tokens,
       |  cast(b.n_tokens AS DOUBLE) / len(regexp_split_to_array(d.text, ' ')) AS fertility
       |FROM documents d JOIN bpe_tok b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
