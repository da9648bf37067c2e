package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting — the classic text-analysis operator a
  * training pipeline uses for keyword extraction and topical filtering.
  *
  * score(d, t) = tf(d, t) · ln(N / df(t)), ranked per document.
  *
  * Determinism note: the RANK key is the score ROUNDED to 6 dp, then
  * the term. Mathematically-equal scores can be computed via different
  * ln() paths (tf=1·ln(100) vs tf=2·ln(10)) that differ in the last
  * ulp, differently per engine — ranking on the raw double would let
  * that ulp decide the order. Rounding collapses the coincidence
  * classes; the term tiebreak resolves them identically everywhere.
  *
  * Scale shape: one explode + two hash aggregations; df is
  * vocabulary-sized and broadcasts to the tf table; the per-doc top-k
  * is a bounded window (k=3) after a single shuffle on doc_id — and at
  * 100 TB the df table is the one to bucket, since vocabulary grows
  * sublinearly in corpus size.
  */
object TfIdf {

  val TopK = 3

  /** q47: top-3 terms per document by tf-idf. */
  def q47Tfidf(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = toks.distinct().groupBy("t").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val score = round(col("tf").cast("double")
      * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("t"))
    tf.join(broadcast(df), "t")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select("doc_id", "rn", "t", "score")
      .orderBy("doc_id", "rn")
  }

  /** q53: PMI collocations — pointwise mutual information over
    * within-document token co-occurrence, the classic collocation /
    * phrase-mining signal. pmi(x,y) = ln(N·c_xy / (c_x·c_y)) over
    * document-level occurrence counts.
    *
    * Pair generation is row-local (sorted distinct tokens → i<j pair
    * explode — the same posting-explode shape as q22, but per row, so
    * nothing shuffles until the pair counts aggregate); marginals are
    * vocabulary-sized and broadcast. The top-50 is ranked on the
    * ROUNDED pmi with (x, y) tiebreak — same cross-engine ulp
    * discipline as the tf-idf ranking — and sort+limit compiles to
    * TakeOrderedAndProject. */
  val PmiMinPairs = 5
  val PmiTopK = 50

  def q53Pmi(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("ts"))
    val pairs = toks.select(explode(expr(
      """flatten(transform(ts, (x, i) ->
        |  transform(slice(ts, i + 2, size(ts)), y -> struct(x AS x, y AS y))))"""
        .stripMargin)).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= PmiMinPairs)
    val marg = toks.select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val pmi = round(log(col("cxy").cast("double") * col("n_docs").cast("double")
      / (col("cx").cast("double") * col("cy").cast("double"))), 6)
    pairs
      .join(broadcast(marg.withColumnsRenamed(Map("t" -> "x", "c" -> "cx"))), "x")
      .join(broadcast(marg.withColumnsRenamed(Map("t" -> "y", "c" -> "cy"))), "y")
      .crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("cxy"), pmi.as("pmi"))
      .orderBy(desc("pmi"), asc("x"), asc("y"))
      .limit(PmiTopK)
  }

  def q53Sql: String =
    s"""WITH d AS (SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(text, ' '))) AS ts
       |           FROM documents),
       |tok AS (SELECT doc_id, unnest(ts) AS t FROM d),
       |pairs AS (SELECT a.t AS x, b.t AS y, count(*) AS cxy
       |          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
       |          GROUP BY 1, 2 HAVING count(*) >= $PmiMinPairs),
       |marg AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT x, y, cxy,
       |  round(ln(cast(cxy AS double) * cast(n_docs AS double)
       |    / (cast(mx.c AS double) * cast(my.c AS double))), 6) AS pmi
       |FROM pairs JOIN marg mx ON x = mx.t JOIN marg my ON y = my.t CROSS JOIN n
       |ORDER BY pmi DESC, x, y LIMIT $PmiTopK""".stripMargin

  def q47Sql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS t FROM documents),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT t, count(*) AS df FROM (SELECT DISTINCT doc_id, t FROM tok) x GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (SELECT doc_id, t,
       |    round(cast(tf AS double) * ln(cast(n_docs AS double) / cast(df AS double)), 6) AS score
       |  FROM tf JOIN df USING (t) CROSS JOIN n),
       |ranked AS (SELECT doc_id, t, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rn
       |  FROM scored)
       |SELECT doc_id, rn, t, score FROM ranked WHERE rn <= $TopK
       |ORDER BY doc_id, rn""".stripMargin
}
