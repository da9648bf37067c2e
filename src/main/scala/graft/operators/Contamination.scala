package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/benchmark decontamination — the canonical pre-training hygiene
  * pass: find training documents that share word n-grams with a held-out
  * benchmark/eval set, so they can be dropped (or down-weighted) before
  * training. Beyond-reference scope (SURVEY §7.5), same family as the
  * q21/q22 dedup ladder but ACROSS two corpora instead of within one.
  *
  * Scale shape (the reason this is its own operator and not a q22
  * variant): the benchmark side is small by construction — eval suites
  * are thousands of documents no matter how big the training corpus is —
  * so its distinct n-gram hash set is BROADCAST and the training corpus
  * streams past it in one narrow pass: no shuffle of training-side
  * n-grams, no self-join, no inverted index. Work is O(train tokens) +
  * one broadcast of O(bench grams); at 100 TB the only wide operation is
  * the per-doc hit aggregation, keyed on doc_id.
  *
  * 8-gram windows (not the 13-gram literature default) because this
  * corpus' documents run 10–99 tokens; the window size is a parameter.
  * Grams are hashed to the portable 60-bit md5 long before the join —
  * the broadcast set and the shuffle both move 8-byte keys, never text.
  */
object Contamination {

  /** q66: per-training-document contamination census against the
    * deterministic benchmark slice `doc_id % benchMod == benchRem`
    * (~2% of the corpus — stands in for an external eval suite while
    * staying oracle-reproducible). Output: every contaminated training
    * doc with its total distinct grams, hit grams, number of benchmark
    * docs hit, and the contamination ratio a curation policy thresholds
    * on. Docs shorter than `n` tokens have no n-grams and cannot be
    * flagged (mirrored by the oracle's window bound). */
  /** Distinct hashed word n-grams per document: (doc_id, h) with h the
    * portable 60-bit md5 of the space-joined n-gram. Row-local explode
    * off one tokenize (lambda CSE — see q61); shared by q66 and the
    * composed q84 decontamination stage. */
  def grams(documents: DataFrame, n: Int): DataFrame =
    documents
      .withColumn("_toks", split(col("text"), " "))
      .withColumn("g", explode(array_distinct(expr(
        s"""IF(size(_toks) >= $n,
           |   transform(sequence(1, size(_toks) - ${n - 1}),
           |             i -> array_join(slice(_toks, i, $n), ' ')),
           |   CAST(array() AS ARRAY<STRING>))""".stripMargin))))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))

  /** Oracle-side mirror of [[grams]]: CTEs ending in
    * `${p}ng(doc_id, h)` over any relation exposing (doc_id, text) —
    * prefix-parameterized like TextOps.shingleSqlFrom so q84 can derive
    * bench- and train-side gram sets in one WITH clause. */
  private[operators] def gramSqlCtes(docs: String, n: Int, p: String = ""): String =
    s"""${p}tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM $docs),
       |${p}pos AS (SELECT doc_id, a,
       |          unnest(generate_series(1, len(a) - ${n - 1})) AS i FROM ${p}tok),
       |${p}ng AS (SELECT DISTINCT doc_id,
       |         cast(concat('0x', substr(md5(list_aggregate(
       |           a[CAST(i AS INT):CAST(i AS INT) + ${n - 1}], 'string_agg', ' ')),
       |           1, 15)) AS BIGINT) AS h
       |       FROM ${p}pos)""".stripMargin

  def q66Decontaminate(documents: DataFrame, n: Int = 8,
                       benchMod: Int = 50, benchRem: Int = 7): DataFrame = {
    val grams = this.grams(documents, n)
    val isBench = pmod(col("doc_id"), lit(benchMod.toLong)) === benchRem
    val bench = grams.filter(isBench).select(col("h"), col("doc_id").as("bench_id"))
    val train = grams.filter(!isBench)
    // One scan of the training corpus: LEFT-join the broadcast bench set
    // (a hit gram fans out per matching bench doc; countDistinct absorbs
    // the fan-out) and fold total-gram + hit accounting into the same
    // per-doc aggregation — tokenizing 100 TB of text twice would double
    // the query's dominant cost for no information.
    train
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("n_grams"),
           countDistinct(when(col("bench_id").isNotNull, col("h"))).as("n_hit_grams"),
           countDistinct("bench_id").as("n_bench_docs"))
      .filter(col("n_hit_grams") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_hit_grams"), col("n_bench_docs"),
        round(col("n_hit_grams").cast("double") / col("n_grams"), 6)
          .as("contamination"))
      .orderBy("doc_id")
  }

  /** q88: FUZZY decontamination — near-duplicate (not just verbatim)
    * leakage of held-out text into the training split. q66 flags a
    * training doc only when an 8-gram survives verbatim; a benchmark
    * item that was paraphrased, reformatted, or partially rewritten
    * into the training corpus shares almost no exact 8-grams while its
    * shingle-set Jaccard stays high — exactly the near-dup signal the
    * q27 LSH machinery measures. This operator runs MinHash-LSH
    * ACROSS the q51 hash split (deciles 0–1 = held-out, 2–9 = train):
    * band-signature collisions between the two sides yield candidate
    * (train, eval) pairs; candidates only are exact-verified; every
    * training doc with a verified match above `threshold` is reported
    * with its match count, best Jaccard, and best-matching eval doc
    * (ties broken by lowest eval id — deterministic).
    *
    * Scale shape: both sides reduce to 4 band rows of three longs per
    * doc before any join. The cross-side band join is left to the
    * planner: with an external benchmark suite as the eval side it
    * broadcasts (the q66 shape lifted to LSH); with THIS query's q51
    * decile split the eval side is ~20% of the corpus — proportional,
    * not fixed-size — and the join degrades to a shuffle on the band
    * key, still moving three longs per band row. Exact verification is
    * candidate-driven (q27's shape): work is |candidates|·shingles-
    * per-doc, never all-pairs, and never within-side.
    *
    * The oracle reuses the ONE q27 LSH chain (`lshPairsSqlCtes`) and
    * filters its symmetric pair set to side-crossing pairs — band
    * collision is symmetric, so cross-side candidates are exactly the
    * cross-side subset of the within-corpus candidates, and the two
    * formulations provably agree while the oracle keeps the
    * single-definition discipline. */
  def q88FuzzyDecontam(documents: DataFrame,
                       threshold: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isEval = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long") % 10 <= 1
    val pairs = Fuzzy.lshCrossPairs(documents, isEval, threshold)
    val wAll = Window.partitionBy("train_id")
    val wBest = Window.partitionBy("train_id").orderBy(desc("jaccard"), asc("eval_id"))
    pairs
      .withColumn("n_eval_matches", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("train_id"), col("n_eval_matches"),
        round(col("jaccard"), 6).as("best_jaccard"),
        col("eval_id").as("best_eval_id"))
      .orderBy("train_id")
  }

  def q88Sql(threshold: Double = 0.2): String =
    s"""WITH ${Fuzzy.lshPairsSqlCtes(
         "tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents)",
         threshold)},
       |dec AS (SELECT doc_id,
       |          cast(concat('0x', substr(md5(cast(doc_id AS varchar)), 1, 15)) AS bigint) % 10 AS d
       |        FROM documents),
       |cr AS (SELECT CASE WHEN da.d >= 2 THEN p.ida ELSE p.idb END AS train_id,
       |              CASE WHEN da.d >= 2 THEN p.idb ELSE p.ida END AS eval_id,
       |              p.jaccard
       |       FROM pairs p
       |       JOIN dec da ON da.doc_id = p.ida
       |       JOIN dec db ON db.doc_id = p.idb
       |       WHERE (da.d <= 1) <> (db.d <= 1)),
       |rk AS (SELECT train_id, eval_id, jaccard,
       |         count(*) OVER (PARTITION BY train_id) AS n_eval_matches,
       |         row_number() OVER (PARTITION BY train_id
       |           ORDER BY jaccard DESC, eval_id) AS rn
       |       FROM cr)
       |SELECT train_id, n_eval_matches, round(jaccard, 6) AS best_jaccard,
       |  eval_id AS best_eval_id
       |FROM rk WHERE rn = 1 ORDER BY train_id""".stripMargin

  def q66Sql(n: Int = 8, benchMod: Int = 50, benchRem: Int = 7): String =
    s"""WITH ${gramSqlCtes("documents", n)},
       |bench AS (SELECT h, doc_id AS bench_id FROM ng WHERE doc_id % $benchMod = $benchRem),
       |train AS (SELECT doc_id, h FROM ng WHERE doc_id % $benchMod <> $benchRem),
       |cnt AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id)
       |SELECT t.doc_id, cnt.n_grams,
       |  count(DISTINCT t.h) AS n_hit_grams,
       |  count(DISTINCT b.bench_id) AS n_bench_docs,
       |  round(cast(count(DISTINCT t.h) AS DOUBLE) / cnt.n_grams, 6) AS contamination
       |FROM train t
       |JOIN bench b ON b.h = t.h
       |JOIN cnt ON cnt.doc_id = t.doc_id
       |GROUP BY t.doc_id, cnt.n_grams
       |ORDER BY t.doc_id""".stripMargin
}

/** q82 lives with q66: both reason about n-gram membership across a
  * split boundary — q66 asks "is eval text IN the training corpus",
  * q82 asks the complementary coverage question. */
object Novelty {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** q82: n-gram novelty curve — for n ∈ {1, 2, 3}, the fraction of
    * the val split's DISTINCT n-grams never seen in the train split
    * (q51's deterministic hash split: decile 1 = val, 2–9 = train;
    * the test decile is untouched, as it must be). This is the
    * coverage/memorization curve a training run reads before trusting
    * held-out loss: low unigram novelty + high trigram novelty is the
    * healthy shape (shared vocabulary, novel composition); LOW
    * trigram novelty means val text is near-verbatim in train and
    * held-out loss is optimistic — the same failure q66 hunts at the
    * document level, here as a corpus-level rate.
    *
    * Scale shape: n-gram explode is map-side off one tokenize; each
    * level reduces to DISTINCT 60-bit hashes per split (map-side
    * partial distinct), and novelty is one left join of the val set
    * against the train set per level — hash keys only, counts only
    * out. */
  def q82NgramNovelty(documents: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 10
    val base = documents
      .select(split(col("text"), " ").as("a"),
        when(h === 1, "val").when(h >= 2, "train").as("split"))
      .filter(col("split").isNotNull)
    def level(n: Int): DataFrame = {
      val g = base.select(col("split"), explode(expr(
        s"CASE WHEN size(a) >= $n THEN transform(sequence(1, size(a) - $n + 1), " +
        s"i -> array_join(slice(a, i, $n), ' ')) ELSE array() END")).as("g"))
        .select(col("split"), h60(col("g")).as("gh")).distinct()
      val v = g.filter(col("split") === "val").select("gh")
      val t = g.filter(col("split") === "train").select(col("gh").as("th"))
      v.join(t, col("gh") === col("th"), "left")
        .agg(count(lit(1)).as("n_val"),
          (count(lit(1)) - count(col("th"))).as("n_unseen"))
        .select(lit(n).as("n"), col("n_val"), col("n_unseen"),
          round(col("n_unseen").cast("double") / col("n_val").cast("double"), 6)
            .as("novelty"))
    }
    (1 to 3).map(level).reduce(_ unionByName _).orderBy("n")
  }

  def q82Sql: String = {
    def h60(s: String) =
      s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    def lvl(n: Int) =
      s"""g$n AS (SELECT DISTINCT split,
         |  ${h60(s"array_to_string(a[i:i+${n - 1}], ' ')")} AS gh
         |  FROM base, unnest(generate_series(1, len(a) - ${n - 1})) t(i)),
         |r$n AS (SELECT $n AS n, count(*) AS n_val,
         |    sum(CASE WHEN t.gh IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unseen
         |  FROM (SELECT gh FROM g$n WHERE split = 'val') v
         |  LEFT JOIN (SELECT gh FROM g$n WHERE split = 'train') t
         |    ON v.gh = t.gh)""".stripMargin
    s"""WITH doc AS (
       |  SELECT regexp_split_to_array(text, ' ') AS a,
       |    CASE WHEN ${h60("CAST(doc_id AS VARCHAR)")} % 10 = 1 THEN 'val'
       |         WHEN ${h60("CAST(doc_id AS VARCHAR)")} % 10 >= 2 THEN 'train'
       |    END AS split
       |  FROM documents),
       |base AS (SELECT * FROM doc WHERE split IS NOT NULL),
       |${lvl(1)},
       |${lvl(2)},
       |${lvl(3)}
       |SELECT n, n_val, n_unseen,
       |  round(n_unseen::DOUBLE / n_val::DOUBLE, 6) AS novelty
       |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
       |      UNION ALL SELECT * FROM r3) u
       |ORDER BY n""".stripMargin
  }
}
