package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language identification + quality scoring over `documents` — the
  * text-analysis operators of a training-data pipeline.
  *
  * Lang-ID is a marker-token heuristic (per-language stopword hit
  * counts, argmax with a fixed precedence order): the classic n-gram
  * profile approach reduced to vocabulary evidence, fully expressible
  * as portable relational expressions so the DuckDB oracle re-derives
  * it. Quality is a deterministic composite of length/diversity/
  * stopword features (same shape as Gopher-style quality rules).
  * Both are narrow single-pass operators — no shuffle at all.
  */
object LangQuality {

  /** Marker vocabularies. The synthetic corpus is English-ish tech
    * prose; the machinery, not the vocabulary, is the operator. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "una"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une"))

  /** Appends `n_tokens`, `n_types`, `hits_*`, `lang_pred`, `quality`
    * to any frame with a `text` column — single row-local pass, shared
    * by q29 and the composed curation pipeline (q40) so composition
    * costs one scan, not one per feature family. */
  def withLangQuality(df: DataFrame): DataFrame = {
    // tokenize ONCE into a temp column: a split() spelled inside each
    // marker-filter lambda is re-evaluated per lambda (and per element
    // for element-wise HOFs) — the q61 lesson, ~6 redundant O(len)
    // splits per document across the feature family
    val toks = col("_toks")
    def hits(words: Seq[String]) = {
      val list = words.map(w => s"'$w'").mkString(", ")
      size(expr(s"filter(_toks, t -> t IN ($list))"))
    }
    // argmax with first-listed precedence on ties; all-zero → "unknown"
    val best = Markers.foldRight(lit("unknown")) { case ((lang, _), acc) =>
      val isMax = Markers.map { case (o, _) => col(s"hits_$lang") >= col(s"hits_$o") }
        .reduce(_ && _)
      when(col(s"hits_$lang") > 0 && isMax &&
        Markers.takeWhile(_._1 != lang).map { case (o, _) =>
          col(s"hits_$o") < col(s"hits_$lang")
        }.foldLeft(lit(true))(_ && _), lit(lang)).otherwise(acc)
    }
    val nTok = col("n_tokens").cast("double")
    val quality =
      least(nTok / 100.0, lit(1.0)) * 0.4 +
        (col("n_types") / nTok) * 0.4 +
        least(col("hits_en").cast("double") / nTok * 5.0, lit(1.0)) * 0.2
    df
      .withColumn("_toks", split(col("text"), " "))
      .withColumns(Map("n_tokens" -> size(toks), "n_types" -> size(array_distinct(toks))))
      .withColumns(Markers.map { case (l, ws) => s"hits_$l" -> hits(ws) }.toMap)
      .withColumn("lang_pred", best)
      .withColumn("quality", round(quality, 6))
      .drop("_toks")
  }

  def q29LangQuality(documents: DataFrame): DataFrame =
    withLangQuality(documents)
      .select("doc_id", "lang_pred", "hits_en", "hits_es", "hits_de", "hits_fr", "quality")
      .orderBy("doc_id")

  /** Regex subword chunker (≤4-char lowercase pieces, digits, residual
    * symbols) as a column — the zero-training row-local token-count
    * mode. The LEARNED merge-table tokenizer is [[Bpe]]; q40/q58 keep
    * this one so the composed pipelines stay a single self-contained
    * scan with no training pass. */
  def bpeTokens: org.apache.spark.sql.Column =
    size(expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)"))

  /** ONE oracle-side definition of the quality ladder (over a scope
    * exposing n_tokens, n_types, hits_en) — shared by q29Sql and
    * q81Sql so the two cannot drift (the shinglesSql lesson). */
  private[operators] val qualitySql: String =
    """round(least(cast(n_tokens AS double) / 100.0, 1.0) * 0.4
      |      + (n_types / cast(n_tokens AS double)) * 0.4
      |      + least(cast(hits_en AS double) / cast(n_tokens AS double) * 5.0, 1.0) * 0.2, 6)""".stripMargin

  private[operators] def hitsSql(ws: Seq[String]) =
    s"len(list_filter(a, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"

  /** Oracle-side row-local feature pass over any relation exposing
    * (doc_id, text): CTEs ending in `${p}feat(doc_id, quality, n_bpe)`
    * — the quality ladder plus the zero-training regex-BPE token count
    * ([[bpeTokens]]). Prefix-parameterized like TextOps.shingleSqlFrom
    * so the composed q84 oracle can score a DERIVED (scrubbed) corpus
    * inside one WITH clause. */
  private[operators] def featSqlCtes(docs: String, p: String = ""): String = {
    val enHits = hitsSql(Markers.find(_._1 == "en").get._2)
    s"""${p}x AS (SELECT doc_id, text, regexp_split_to_array(text, ' ') AS a FROM $docs),
       |${p}t AS (SELECT doc_id, text, len(a) AS n_tokens,
       |            len(list_distinct(a)) AS n_types, $enHits AS hits_en
       |          FROM ${p}x),
       |${p}feat AS (SELECT doc_id, $qualitySql AS quality,
       |    len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]')) AS n_bpe
       |  FROM ${p}t)""".stripMargin
  }

  def q29Sql: String = {
    val hitCols = Markers.map { case (l, ws) => s"${hitsSql(ws)} AS hits_$l" }.mkString(", ")
    val caseArms = Markers.map { case (lang, _) =>
      val geAll = Markers.map { case (o, _) => s"hits_$lang >= hits_$o" }.mkString(" AND ")
      val beatsPrior = Markers.takeWhile(_._1 != lang)
        .map { case (o, _) => s"hits_$o < hits_$lang" }
        .foldLeft(Seq("TRUE"))(_ :+ _).mkString(" AND ")
      s"WHEN hits_$lang > 0 AND $geAll AND $beatsPrior THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, CASE $caseArms ELSE 'unknown' END AS lang_pred,
       |  hits_en, hits_es, hits_de, hits_fr,
       |  $qualitySql AS quality
       |FROM (
       |  SELECT doc_id, len(a) AS n_tokens, len(list_distinct(a)) AS n_types, $hitCols
       |  FROM (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents) x) t
       |ORDER BY doc_id""".stripMargin
  }
}
