package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained language-model perplexity scoring — the CCNet-shaped
  * quality gate (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020): train a
  * statistical LM on the corpus, score every document by per-token
  * cross-entropy, flag the high-perplexity tail. The reference pipeline
  * has no LM gate (its quality signals are row-local ratios —
  * `crypto_etl_pipeline.py:139-170`'s cleaning ladder is regex/cast
  * only); this is a beyond-reference training-data operator, a
  * miniature of the KenLM 5-gram filter: a word-BIGRAM Laplace model,
  * which keeps both training and scoring as two aggregate passes.
  *
  * Determinism contract (the reason scores cross-check in DuckDB):
  * each bigram's surprisal -log2((c12+1)/(c1+V)) is rounded ONCE to
  * integer micro-bits (×1e6, nearest), and every downstream total is
  * LONG arithmetic — order-free sums, integer flag comparison
  * (mb > nbg·T_micro), one final double division rounded to 6 dp. No
  * float ever accumulates across rows, so partition order can't move
  * the result — the same micro-integer discipline as q67's packing.
  *
  * Scale shape: tokenize/bigram map-side; every shuffle key is a
  * 60-bit hash (never a word pair string). Training = one groupBy on
  * bigram hash + one on prefix hash (counts only); scoring re-joins
  * the bigram stream to the model on the hash — at web scale the model
  * is Zipf-heavy-tailed, so the join stays a shuffle equi-join (AQE
  * broadcasts it when the model is small) and the hot-prefix skew
  * lives in the COUNT aggregates, where map-side partial aggregation
  * absorbs it (the q55 salting valve exists if a single bigram ever
  * dominates a partition). Vocabulary size V is the one scalar
  * barrier, folded back as a 1-row broadcast like q47's N.
  */
object LmScore {

  /** Flag threshold in bits/token. Corpus-calibrated: the synthetic
    * word corpora average ≈ 4.89–4.91 bits/token with p97 ≈ 4.95–4.98
    * (measured at sf0.001/0.01/0.1 and the GenData long-doc corpus),
    * so 4.98 flags the genuinely-rare-continuation tail (~3 % of
    * docs), not half the corpus. Deployments tune this like any CCNet
    * perplexity cut. */
  val DefaultFlagBits = 4.98

  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-document LM evidence: (doc_id, source, mb, nbg) — mb is the
    * exact long sum of micro-bit surprisals, nbg the bigram count.
    * Shared by the q77 report and the q81 calibration join. Documents
    * with fewer than 2 tokens carry no bigram evidence and are
    * excluded (mirrored in the oracle). */
  def perDocBits(documents: DataFrame): DataFrame = {
    val bg = documents
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(a)-1), i -> struct(a[i-1] AS w1, a[i] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("source"),
        h60(concat(col("b.w1"), lit("\u0001"), col("b.w2"))).as("bgh"),
        h60(col("b.w1")).as("w1h"),
        h60(col("b.w2")).as("w2h"))
    // max(w2h) rides the bigram-type aggregate: every (w1h, bgh) group
    // holds one w2 (same 2^-60 md5-collision convention as the keys
    // themselves), so V can be counted from the MODEL relation below
    // instead of a third full pass over the corpus-sized bigram stream
    // — training drops from three bigram-stream passes to two, and the
    // distinct-aggregate input shrinks from corpus bigram occurrences
    // to bigram types (guide §1.2: remove passes before tuning them)
    val c12 = bg.groupBy(col("w1h"), col("bgh"))
      .agg(count(lit(1)).as("c12"), max("w2h").as("w2h"))
    val c1 = c12.groupBy("w1h").agg(sum("c12").as("c1"))
    // exact_ prefix: the vocabulary size is a SEMANTIC distinct count
    // (Laplace smoothing denominator — a sketched V perturbs every
    // surprisal); valve-protected by the exact_ alias contract
    val v = c12.agg(count_distinct(col("w2h")).as("exact_v"))
    // Known cross-engine boundary: log2 here is Spark's
    // Math.log(x)/Math.log(2) vs DuckDB's std::log2 — they can differ in
    // the last ulp, so a surprisal landing within ~1e-9 of a .5 micro-bit
    // boundary could round to different longs per engine (flipping mb by
    // 1 and, at the exact gate threshold, a flag). The surprisal domain
    // is the discrete set {-log2((c12+1)/(c1+V))}, so the risk is
    // measurable, not hypothetical: LmScoreSpec's boundary-margin test
    // asserts every distinct model probability sits ≥100× ulp-scale
    // away from a rounding boundary on the shipped corpora. The same
    // exposure (and the same measured-margin defense) applies to
    // MixStats' pico-bit JS terms and RpLsh's sign test near zero.
    val model = c12.join(c1, "w1h").crossJoin(broadcast(v))
      .select(col("bgh"),
        round(-log2((col("c12") + lit(1)).cast("double")
          / (col("c1") + col("exact_v")).cast("double")) * lit(1e6))
          .cast("long").as("microbits"))
    bg.select("doc_id", "source", "bgh")
      .join(model, "bgh")
      .groupBy("doc_id", "source")
      .agg(sum("microbits").as("mb"), count(lit(1)).as("nbg"))
  }

  /** q77: per-source LM cross-entropy report — n docs scored, total
    * bigrams, average bits/token, and how many docs the perplexity
    * gate flags. */
  def q77LmPerplexity(documents: DataFrame,
                      flagBits: Double = DefaultFlagBits): DataFrame = {
    val flagMicro = math.round(flagBits * 1e6)
    perDocBits(documents)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("nbg").as("n_bigrams"),
        round(sum(col("mb")).cast("double")
          / (sum(col("nbg")).cast("double") * lit(1e6)), 6).as("avg_bits"),
        sum(when(col("mb") > col("nbg") * lit(flagMicro), 1L).otherwise(0L))
          .as("n_flagged"))
      .orderBy("source")
  }

  /** The per-document CTE chain (…→ ${p}per_doc(doc_id, source, mb,
    * nbg)), shared by the q77 and q81 oracles — one definition so the
    * two cannot drift. Parameterized like TextOps.shingleSqlFrom:
    * `docs` is any relation exposing (doc_id, source, text) and `p`
    * prefixes every internal CTE name, so a composed oracle (q84) can
    * train/score the LM on a DERIVED corpus inside one WITH clause. */
  private[operators] def perDocSqlCtesFrom(docs: String, p: String): String = {
    def h60(s: String) =
      s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    s"""${p}tok AS (
       |  SELECT doc_id, source, regexp_split_to_array(text, ' ') AS a
       |  FROM $docs WHERE len(regexp_split_to_array(text, ' ')) >= 2),
       |${p}bg AS (
       |  SELECT doc_id, source,
       |    ${h60("a[i] || chr(1) || a[i+1]")} AS bgh,
       |    ${h60("a[i]")} AS w1h, ${h60("a[i+1]")} AS w2h
       |  FROM ${p}tok, unnest(generate_series(1, len(a) - 1)) AS t(i)),
       |${p}c12 AS (SELECT w1h, bgh, count(*) AS c12 FROM ${p}bg GROUP BY 1, 2),
       |${p}c1 AS (SELECT w1h, sum(c12) AS c1 FROM ${p}c12 GROUP BY 1),
       |${p}v AS (SELECT count(DISTINCT w2h) AS v FROM ${p}bg),
       |${p}model AS (
       |  SELECT bgh, CAST(round(-log2((c12 + 1)::DOUBLE / (c1 + v)::DOUBLE)
       |    * 1e6) AS BIGINT) AS microbits
       |  FROM ${p}c12 JOIN ${p}c1 USING (w1h), ${p}v),
       |${p}per_doc AS (
       |  SELECT doc_id, source, sum(microbits)::BIGINT AS mb,
       |    count(*) AS nbg
       |  FROM ${p}bg JOIN ${p}model USING (bgh) GROUP BY 1, 2)""".stripMargin
  }

  private def perDocSqlCtes: String = perDocSqlCtesFrom("documents", "")

  def q77Sql(flagBits: Double = DefaultFlagBits): String = {
    val flagMicro = math.round(flagBits * 1e6)
    s"""WITH $perDocSqlCtes
       |SELECT source, count(*) AS n_docs, sum(nbg)::BIGINT AS n_bigrams,
       |  round(sum(mb)::DOUBLE / (sum(nbg)::DOUBLE * 1e6), 6) AS avg_bits,
       |  sum(CASE WHEN mb > nbg * $flagMicro THEN 1 ELSE 0 END)::BIGINT
       |    AS n_flagged
       |FROM per_doc GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q81: calibration of the engine's two independent quality signals —
    * per 0.1-bit band of LM cross-entropy (q77's per-doc bits/token),
    * how many docs land there and what the heuristic quality score
    * (q29's row-local ladder) averages. This is the query a pipeline
    * runs before trusting either gate alone: if the LM tail does not
    * coincide with low heuristic quality, the two filters are catching
    * DIFFERENT failure modes and should compose (AND/OR decided from
    * this table), not substitute.
    *
    * Determinism: the band is INTEGER floor-division on the exact
    * micro-bit longs ((10·mb) div (nbg·1e6) — never a float bucket
    * edge), and avg_quality sums the 6-dp-rounded quality re-scaled to
    * exact micro longs. Same discipline as q77; partition-order-free.
    *
    * Scale shape: q77's per-doc evidence joined doc_id-to-doc_id with
    * the row-local quality pass — one equi-join on an 8-byte key, then
    * a ≤ ~dozen-row aggregate. */
  def q81QualityCalibration(documents: DataFrame): DataFrame = {
    val bits = perDocBits(documents).select(col("doc_id"), col("mb"), col("nbg"))
    val qual = LangQuality.withLangQuality(documents)
      .select(col("doc_id"),
        round(col("quality") * lit(1e6)).cast("long").as("qm"))
    bits.join(qual, "doc_id")
      .select(expr("(10 * mb) div (nbg * 1000000)").as("bits_band"),
        col("mb"), col("nbg"), col("qm"))
      .groupBy("bits_band")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("mb")).cast("double")
          / (sum(col("nbg")).cast("double") * lit(1e6)), 6).as("avg_bits"),
        round(sum(col("qm")).cast("double")
          / (count(lit(1)).cast("double") * lit(1e6)), 6).as("avg_quality"))
      .orderBy("bits_band")
  }

  def q81Sql: String = {
    val enHits = LangQuality.hitsSql(
      LangQuality.Markers.find(_._1 == "en").get._2)
    s"""WITH $perDocSqlCtes,
       |qual AS (
       |  SELECT doc_id,
       |    CAST(round(${LangQuality.qualitySql} * 1e6) AS BIGINT) AS qm
       |  FROM (SELECT doc_id, len(a) AS n_tokens,
       |          len(list_distinct(a)) AS n_types,
       |          $enHits AS hits_en
       |        FROM (SELECT doc_id, regexp_split_to_array(text, ' ') AS a
       |              FROM documents) x) t)
       |SELECT (10 * mb) // (nbg * 1000000) AS bits_band,
       |  count(*) AS n_docs,
       |  round(sum(mb)::DOUBLE / (sum(nbg)::DOUBLE * 1e6), 6) AS avg_bits,
       |  round(sum(qm)::DOUBLE / (count(*)::DOUBLE * 1e6), 6) AS avg_quality
       |FROM per_doc JOIN qual USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
