package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (beyond-reference scope, SURVEY
  * §7.5). All pure Column expressions (split/transform/explode/md5);
  * zero UDFs, so tokenization and hashing stay inside whole-stage
  * codegen and scale linearly with input splits.
  *
  * Portable hashing: every hash that crosses the engine boundary (the
  * DuckDB oracle re-derives it) is the first 15 hex chars of md5, cast
  * to a 60-bit long — identical in any engine, unlike builtin `hash()`.
  */
object TextOps {

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Word-trigram shingle set, exploded to (doc_id, s) distinct rows.
    * Word shingles are far more selective than char n-grams on this
    * corpus (54 k vs 15.6 M candidate join pairs at 500 docs), which is
    * what keeps the similarity self-join tractable at scale. */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("s", explode(array_distinct(
        expr("transform(sequence(1, greatest(size(toks) - 2, 1)), " +
             "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))))
      .select("doc_id", "s")

  // Per-doc generate_series (no position cap): the former `range(1, 201)`
  // cross join silently truncated shingles for docs >202 tokens while the
  // Spark side was uncapped — a latent oracle divergence (same bug r5
  // fixed in q66Sql). This mirrors sequence(1, greatest(size-2, 1)) exactly.
  // ONE shared definition (`shingleSqlFrom`) so q22/q23/q27/q28/q40/q56
  // cannot re-grow private capped copies. The `p` prefix renames every
  // internal CTE (tok → ${p}tok, …) so composed oracles (q84) can stack
  // several instances of the chain in one WITH clause without name
  // collisions; the caller's token CTE must be named `${p}tok`.
  private[operators] def shingleSqlFrom(tokCte: String, p: String = ""): String =
    s"""$tokCte,
       |${p}pos AS (SELECT doc_id, a,
       |          unnest(generate_series(1, greatest(len(a) - 2, 1))) AS i
       |        FROM ${p}tok),
       |${p}sh AS MATERIALIZED (SELECT DISTINCT doc_id,
       |         a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT)+1] || ' ' || a[CAST(i AS INT)+2] AS s
       |       FROM ${p}pos)""".stripMargin

  private[operators] val shinglesSql = shingleSqlFrom(
    "tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents)")

  /** Per-document text statistics: token/type counts, type-token ratio,
    * stopword ratio, mean token length (quality-scoring features).
    * Narrow, no shuffle. */
  def q20TextStats(documents: DataFrame): DataFrame = {
    val toks = col("_toks")
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    documents
      .withColumn("_toks", split(col("text"), " ")) // tokenize once (lambda CSE, see q61)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_types"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
        (size(expr(s"filter(_toks, t -> t IN ($stopList))")).cast("double")
          / size(toks)).as("stop_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast("double")
          / size(toks)).as("avg_token_len"))
      .orderBy("doc_id")
  }

  def q20Sql: String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, length(text) AS n_chars_calc,
       |  len(a) AS n_tokens, len(list_distinct(a)) AS n_types,
       |  cast(len(list_distinct(a)) AS double) / len(a) AS ttr,
       |  cast(len(list_filter(a, t -> t IN ($stopList))) AS double) / len(a) AS stop_ratio,
       |  cast(length(replace(text, ' ', '')) AS double) / len(a) AS avg_token_len
       |FROM (SELECT doc_id, text, regexp_split_to_array(text, ' ') AS a FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Exact dedup (hash-groupBy): one row per distinct text, keeper = min
    * doc_id. At 100 TB this is the canonical first dedup pass: shuffle
    * on a 128-bit content hash, never on the text itself. */
  def q21ExactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  def q21Sql: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keeper, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin

  /** Document-frequency cap for pair generation: a shingle appearing in
    * more than `maxDf` documents is a stop-shingle — it contributes
    * f²/2 candidate pairs (the blowup an uncapped inverted index shares
    * with a self-join) while carrying no near-dup signal. 64 is above
    * the observed max DF at sf0.1 (25), so small-scale results are
    * byte-identical with the cap armed; at 100 TB a deployment tunes it
    * down (and MinHash-LSH, q27, is the sublinear path anyway). The
    * oracle SQL applies the identical filter, so parity holds at any
    * scale even when the cap bites.
    *
    * MEASURED cap bite (round-9 gen-sf1 rehearsal, NOTES_r9): a planted
    * near-dup FAMILY of ~146 docs shares its trigrams across all 146,
    * so the family's shingles cross df=64 and the capped pair graph
    * (q22/q56/q98) legitimately empties — in BOTH engines, so parity
    * holds — while cap-free MinHash-LSH (q27: band collisions + exact
    * verify) still surfaces the family. That asymmetry is the design:
    * the df cap protects the EXACT index from the f²/2 blowup precisely
    * when copy-families get large, and banding — whose candidate count
    * is per-band-bucket, not per-shingle — is the path that must find
    * what the cap drops. */
  val DefaultMaxDf = 64

  /** Drop accounting for the DF cap: (n_dropped_shingles,
    * n_dropped_postings) for a given corpus + cap. Eager — one action —
    * and logged, so a pipeline can record exactly what the cap
    * discarded. Kept OUT of q22's lazy plan: accounting is opt-in, not
    * a per-query extra job. */
  def droppedShingleStats(documents: DataFrame, maxDf: Int = DefaultMaxDf): (Long, Long) = {
    val r = shingles(documents)
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .agg(count(lit(1)).as("n_shingles"),
           coalesce(sum("df"), lit(0L)).as("n_postings"))
      .head()
    val stats = (r.getLong(0), r.getLong(1))
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"ngram-jaccard DF cap $maxDf: dropped ${stats._1} shingles " +
            s"(${stats._2} postings) from pair generation")
    stats
  }

  /** N-gram Jaccard near-dup pairs via an inverted shingle index,
    * join-free: group by shingle → sorted posting list → explode the
    * i<j pairs of each list → count per pair. One shuffle of the
    * shingle table instead of the two a self-join costs, and the pair
    * counts partial-aggregate map-side. Posting-list length is bounded
    * by the `maxDf` stop-shingle cap (pair-side only: Jaccard
    * denominators still count every shingle, mirroring the oracle).
    *
    * The inverted index is keyed on the portable 60-bit md5 of the
    * shingle, NOT the shingle text: the big shuffle then moves 8-byte
    * longs instead of ~25-byte strings (and compares longs, not
    * strings, while grouping). Per-doc distinctness is unchanged and
    * the oracle derives the identical hash, so even a collision (2^-60
    * per pair) would agree across engines. */
  def q22NgramJaccard(documents: DataFrame, threshold: Double = 0.2,
                      maxDf: Int = DefaultMaxDf): DataFrame = {
    val sh = shingles(documents).select(col("doc_id"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
    // BOTH consumers read the same grouped posting-list frame: the two
    // branches plan identical Exchanges, so ReuseExchange computes the
    // shingle explode + group ONCE (set sizes are per-doc posting
    // membership counts — each doc appears once per distinct shingle).
    val posting = sh.groupBy("h").agg(sort_array(collect_list("doc_id")).as("ids"))
    val sizes = posting.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = posting
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS ida, y AS idb))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.as("sa"), col("ida") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("idb") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("ninter").cast("double") / (col("sa.n") + col("sb.n") - col("ninter")))
      .filter(col("jaccard") >= threshold)
      .select("ida", "idb", "ninter", "jaccard")
      .orderBy("ida", "idb")
  }

  def q22Sql(threshold: Double = 0.2, maxDf: Int = DefaultMaxDf): String =
    s"""WITH ${pairsSqlCtes(threshold, maxDf)}
       |SELECT ida, idb, ninter, jaccard FROM pairs
       |ORDER BY ida, idb""".stripMargin

  /** q60: normalization-aware exact dedup — q21's content-hash dedup
    * after canonicalization (lowercase, strip non-alphanumerics,
    * collapse whitespace): catches re-encodings of the same document
    * that byte-exact hashing misses (case changes, punctuation drift,
    * double spaces) while staying a pure map-side hash — the cheap
    * middle ground between exact (q21) and similarity (q22/q27) dedup.
    * Same scale shape as q21: the shuffle moves 128-bit hashes of the
    * NORMALIZED text, never text. */
  def q60NormalizedDedup(documents: DataFrame): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")
    documents
      .groupBy(md5(norm).as("norm_md5"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")
  }

  def q60Sql: String =
    """SELECT md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_md5,
      |  min(doc_id) AS keeper, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin

  /** q61: within-document repetition metrics — the Gopher-style quality
    * rules that catch boilerplate and degenerate generations: fraction
    * of duplicate tokens and duplicate word-bigrams. Pure array
    * expressions, one narrow scan; single-token docs define the bigram
    * fraction as 0 (guarded identically in both engines — DuckDB `||`
    * null-propagates where concat_ws skips, so the guard, not luck,
    * carries the parity). */
  def q61Repetition(documents: DataFrame): DataFrame =
    documents
      // hoist the token array into a column FIRST: a `split(text)`
      // spelled inside the transform lambda is re-evaluated per element
      // (no CSE across lambda scopes) — O(len²) splitting per doc
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("a"),
        when(size(col("a")) >= 2,
          expr("transform(sequence(1, size(a) - 1), " +
               "i -> concat_ws(' ', a[i-1], a[i]))"))
          .otherwise(array()).as("bg"))
      .select(col("doc_id"), size(col("a")).as("n_tokens"),
        round(lit(1.0) - size(array_distinct(col("a"))).cast("double")
          / size(col("a")), 6).as("dup_token_frac"),
        when(size(col("bg")) > 0,
          round(lit(1.0) - size(array_distinct(col("bg"))).cast("double")
            / size(col("bg")), 6)).otherwise(0.0).as("dup_bigram_frac"))
      .orderBy("doc_id")

  def q61Sql: String =
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents),
      |bg AS (SELECT doc_id, a,
      |         CASE WHEN len(a) >= 2
      |              THEN [a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT)+1] FOR i IN range(1, greatest(len(a), 2))]
      |              ELSE [] END AS b
      |       FROM tok)
      |SELECT doc_id, len(a) AS n_tokens,
      |  round(1.0 - cast(len(list_distinct(a)) AS double) / len(a), 6) AS dup_token_frac,
      |  CASE WHEN len(b) > 0
      |       THEN round(1.0 - cast(len(list_distinct(b)) AS double) / len(b), 6)
      |       ELSE 0.0 END AS dup_bigram_frac
      |FROM bg ORDER BY doc_id""".stripMargin

  /** Shared oracle-SQL fragment: the q22 near-dup pair relation as CTEs
    * ending in `pairs(ida, idb)` — reused by q22/q56 (and restated by
    * q40, which deliberately re-derives). */
  private[operators] def pairsSqlCtes(threshold: Double, maxDf: Int): String =
    s"""$shinglesSql,
       |shh AS (SELECT doc_id,
       |          cast(concat('0x', substr(md5(s), 1, 15)) AS bigint) AS h FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
       |keep AS (SELECT h FROM shh GROUP BY h HAVING count(*) <= $maxDf),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS ninter
       |          FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
       |          JOIN keep k ON k.h = a.h
       |          GROUP BY 1, 2),
       |pairs AS (SELECT ida, idb, ninter,
       |            cast(ninter AS double) / (sa.n + sb.n - ninter) AS jaccard
       |          FROM inter
       |          JOIN sizes sa ON ida = sa.doc_id
       |          JOIN sizes sb ON idb = sb.doc_id
       |          WHERE cast(ninter AS double) / (sa.n + sb.n - ninter) >= $threshold)"""
      .stripMargin

  /** q56: near-duplicate CLUSTER assignment — connected components over
    * the q22 pair graph. Pairwise output ((a,b),(b,c)) under-specifies
    * dedup: a production keeper decision is per component ({a,b,c} →
    * keep min), so this materializes (doc_id, cluster = min doc_id in
    * component) for every doc that appears in any near-dup pair.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the min of its own label and its neighbors' labels; converges
    * in O(component diameter) rounds (near-dup components are shallow:
    * chains of transitive near-dups). Each round is one shuffle join +
    * one aggregate; the driver only sees the single `changed` count per
    * round (the loop is the standard Pregel shape, and the per-round
    * plans are checkpoint-bounded so lineage does not grow with
    * iterations). At 100 TB this is the same algorithm GraphX/GraphFrames
    * run; the pair graph is tiny relative to the corpus (only near-dup
    * members appear).
    *
    * The DuckDB oracle re-derives components with a recursive CTE
    * (transitive closure + min per node) — different algorithm, same
    * fixpoint, which makes the cross-engine check meaningful. */
  def q56DedupClusters(documents: DataFrame, threshold: Double = 0.2,
                       maxDf: Int = DefaultMaxDf, maxIters: Int = 30): DataFrame = {
    val pairs = q22NgramJaccard(documents, threshold, maxDf).select("ida", "idb")
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .union(pairs.select(col("idb").as("src"), col("ida").as("dst")))
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min("lab").as("nlab"))
      val updated = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("lab").as("oldlab"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
        .localCheckpoint(false) // bound lineage across rounds
      changed = updated.filter(col("lab") =!= col("oldlab")).count()
      labels = updated.select("id", "lab")
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("lab").as("cluster"))
      .orderBy("doc_id")
  }

  def q56Sql(threshold: Double = 0.2, maxDf: Int = DefaultMaxDf): String =
    s"""WITH RECURSIVE
       |${pairsSqlCtes(threshold, maxDf)},
       |edges AS (SELECT ida AS src, idb AS dst FROM pairs
       |          UNION ALL SELECT idb, ida FROM pairs),
       |reach(id, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst)
       |SELECT id AS doc_id, min(lab) AS cluster
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** q98: canonical-document selection per near-dup cluster — the
    * KEEPER DECISION a production dedup actually ships: q56 answers
    * "which docs form a clone family", this answers "which single doc
    * of each family enters the training set". Policy: highest q29
    * quality wins, doc_id breaks ties (min-id = the q21/q27 keeper
    * convention) — quality-aware where q27's pairwise higher-id-drops
    * rule is quality-blind and can discard the cleanest copy.
    *
    * Determinism: the selection key is quality ROUNDED to 6 dp (the
    * q47 rounded-key discipline) so a cross-engine ulp cannot flip the
    * argmax; realized as ONE `max(struct(q, -doc_id))` aggregate per
    * cluster — no global window, and the negated id turns the
    * lexicographic struct max into (q desc, id asc) exactly.
    *
    * Scale shape: q56's component labels (near-dup members only — tiny
    * vs the corpus) join the row-local quality features on doc_id,
    * then one partial-aggregable groupBy(cluster). Nothing new
    * shuffles at corpus scale. */
  def q98ClusterCanon(documents: DataFrame, threshold: Double = 0.2,
                      maxDf: Int = DefaultMaxDf): DataFrame = {
    val clusters = q56DedupClusters(documents, threshold, maxDf)
    // quality is a row-local feature — compute it only for cluster
    // MEMBERS (near-dup members ≪ corpus at any scale), not the whole
    // table: the semi-join prunes the regex feature pass to the rows
    // the canon aggregate actually reads
    val qual = LangQuality.withLangQuality(
        documents.join(clusters.select("doc_id"), Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), round(col("quality"), 6).as("q"))
    clusters.join(qual, "doc_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("q"), negate(col("doc_id")).as("nid"))).as("m"))
      .select(col("cluster"), negate(col("m.nid")).as("canon_doc_id"),
        col("m.q").as("canon_quality"), col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
      .orderBy("cluster")
  }

  def q98Sql(threshold: Double = 0.2, maxDf: Int = DefaultMaxDf): String =
    s"""WITH RECURSIVE
       |${pairsSqlCtes(threshold, maxDf)},
       |edges AS (SELECT ida AS src, idb AS dst FROM pairs
       |          UNION ALL SELECT idb, ida FROM pairs),
       |reach(id, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
       |cl AS (SELECT id AS doc_id, min(lab) AS cluster FROM reach GROUP BY id),
       |${graft.operators.LangQuality.featSqlCtes("documents", "cq_")},
       |sel AS (SELECT c.cluster, c.doc_id, round(f.quality, 6) AS q
       |        FROM cl c JOIN cq_feat f USING (doc_id)),
       |r AS (SELECT cluster, doc_id, q,
       |        row_number() OVER (PARTITION BY cluster
       |          ORDER BY q DESC, doc_id) AS rk,
       |        count(*) OVER (PARTITION BY cluster) AS n
       |      FROM sel)
       |SELECT cluster, doc_id AS canon_doc_id, q AS canon_quality,
       |  n AS n_members, n - 1 AS n_dropped
       |FROM r WHERE rk = 1 ORDER BY cluster""".stripMargin

  /** q100: per-source lexical diversity census — corpus-level
    * distinct-1 / distinct-2 ratios (the self-BLEU-adjacent diversity
    * signal of Li et al. 2016, "A Diversity-Promoting Objective"):
    * distinct unigrams over total tokens and distinct bigrams over
    * total bigrams, per source. A template-dominated or
    * model-generated source scores low on distinct-2 long before q86's
    * span census flags individual docs — this is the source-granular
    * early warning.
    *
    * Scale: two explode → groupBy(source) aggregations with
    * count_distinct. At 100 TB the exact distinct is the watch item
    * (per-source distinct bigram counts shuffle vocabulary-sized
    * partials); the KMV sketch (q46/q57) is the drop-in valve. */
  def q100DistinctNgrams(documents: DataFrame): DataFrame = {
    val arr = documents.select(col("source"), split(col("text"), " ").as("a"))
    val uni = arr.select(col("source"), explode(col("a")).as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct("t").as("d_unigrams"))
    val bg = arr
      .select(col("source"), explode(expr(
        """if(size(a) < 2, cast(array() as array<string>),
          |   transform(sequence(0, size(a) - 2),
          |             i -> concat(a[i], ' ', a[i + 1])))""".stripMargin)).as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct("t").as("d_bigrams"))
    uni.join(bg, "source")
      .select(col("source"), col("n_tokens"), col("d_unigrams"),
        round(col("d_unigrams") / col("n_tokens"), 6).as("distinct1"),
        col("n_bigrams"), col("d_bigrams"),
        round(col("d_bigrams") / col("n_bigrams"), 6).as("distinct2"))
      .orderBy("source")
  }

  def q100Sql(): String =
    s"""WITH arr AS (SELECT source, regexp_split_to_array(text, ' ') AS a
       |             FROM documents),
       |u AS (SELECT source, unnest(a) AS t FROM arr),
       |ua AS (SELECT source, count(*) AS n_tokens,
       |         count(DISTINCT t) AS d_unigrams FROM u GROUP BY source),
       |b AS (SELECT source, a[i] || ' ' || a[i + 1] AS t
       |      FROM arr, unnest(range(1, len(a))) AS r(i)),
       |ba AS (SELECT source, count(*) AS n_bigrams,
       |         count(DISTINCT t) AS d_bigrams FROM b GROUP BY source)
       |SELECT source, n_tokens, d_unigrams,
       |  round(d_unigrams / n_tokens, 6) AS distinct1,
       |  n_bigrams, d_bigrams,
       |  round(d_bigrams / n_bigrams, 6) AS distinct2
       |FROM ua JOIN ba USING (source) ORDER BY source""".stripMargin

  /** MinHash signatures (k=8) over the shingle sets, with a fully
    * engine-portable hash family: h = md5-60bit mod P, slot_i =
    * min((a_i·h + b_i) mod P). One groupBy per doc — the signature is
    * 8 longs instead of ~100 shingles, which is what LSH banding
    * buckets on at scale. a_i < 2×10^9 keeps a_i·h < 2^63. */
  val MinhashP = 4294967291L // largest prime < 2^32
  val MinhashA: Seq[Long] = Seq(1L, 31L, 1299709L, 15485863L,
    179424673L, 32452843L, 982451653L, 1999999999L)
  val MinhashB: Seq[Long] = Seq(0L, 7L, 104729L, 1299721L,
    86028157L, 15485917L, 49979687L, 899999963L)

  /** MinHash signature aggregation over an existing (doc_id, s) shingle
    * frame — shared by q23 and the LSH dedup so a cached shingle set is
    * computed once. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % MinhashP
    val slots = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * h + lit(b)) % MinhashP).as(s"mh$i")
    }
    sh.groupBy("doc_id").agg(slots.head, slots.tail: _*)
  }

  def q23Minhash(documents: DataFrame): DataFrame =
    minhashSignatures(shingles(documents)).orderBy("doc_id")

  def q23Sql: String = {
    val h = "(cast(concat('0x', substr(md5(s), 1, 15)) AS bigint) % 4294967291)"
    val slots = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * $h + $b) % 4294967291) AS mh$i"
    }.mkString(",\n  ")
    s"""WITH $shinglesSql
       |SELECT doc_id,
       |  $slots
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
