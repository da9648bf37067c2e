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
  def q66Decontaminate(documents: DataFrame, n: Int = 8,
                       benchMod: Int = 50, benchRem: Int = 7): DataFrame = {
    // tokenize once, hoisted out of the lambda (lambda CSE — see q61)
    val grams = documents
      .withColumn("_toks", split(col("text"), " "))
      .withColumn("g", explode(array_distinct(expr(
        s"""IF(size(_toks) >= $n,
           |   transform(sequence(1, size(_toks) - ${n - 1}),
           |             i -> array_join(slice(_toks, i, $n), ' ')),
           |   CAST(array() AS ARRAY<STRING>))""".stripMargin))))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
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

  def q66Sql(n: Int = 8, benchMod: Int = 50, benchRem: Int = 7): String =
    s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents),
       |pos AS (SELECT doc_id, a,
       |          unnest(generate_series(1, len(a) - ${n - 1})) AS i FROM tok),
       |ng AS (SELECT DISTINCT doc_id,
       |         cast(concat('0x', substr(md5(list_aggregate(
       |           a[CAST(i AS INT):CAST(i AS INT) + ${n - 1}], 'string_agg', ' ')),
       |           1, 15)) AS BIGINT) AS h
       |       FROM pos),
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
