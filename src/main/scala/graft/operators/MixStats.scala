package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mix distribution diagnostics — per-source Jensen–Shannon
  * divergence between the source's unigram distribution and the whole
  * corpus's. This is the signal a data-mixing pipeline watches next to
  * its token budgets (q69): a source whose JS spikes is distributionally
  * unlike the mix (fresh domain, contamination, or a scrape gone wrong).
  * Beyond-reference operator (the reference has no text corpus at all).
  *
  * The vocabulary tail is closed-form, which is what keeps this ONE
  * equi-join instead of a vocab×sources expansion: for a word absent
  * from source s (p_s = 0), its JS term is 0.5·p_c·log2(p_c/(p_c/2)) =
  * 0.5·p_c, so the whole absent-word tail sums to
  * 0.5·(1 − Σ_{w∈s} p_c(w)) — computable from the source's OWN rows.
  * Only (source, word) pairs that exist are ever materialized.
  *
  * Determinism: the same micro-integer discipline as q77 — each
  * present-word JS term is rounded once to pico-bits (×1e12 — terms
  * are ≤ 1, and vocab ≤ 1e5 keeps the long sum ≪ 2^63), the tail uses
  * exact long token counts, and the one final double expression is
  * written with identical association in Spark and the oracle.
  *
  * Scale shape: tokenize map-side; shuffle keys are the 60-bit word
  * hash (count aggregates with map-side partials — Zipf-hot words
  * collapse before the exchange) and the source id. The corpus-count
  * side joins the per-source side on the word hash; corpus total N is
  * the one scalar barrier (1-row broadcast, q47's N pattern). */
object MixStats {

  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** q79: per-source (n_tokens, n_types, js_bits vs corpus). */
  def q79SourceDivergence(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .select(col("source"), h60(col("w")).as("wh"))
    val csw = tok.groupBy("source", "wh").agg(count(lit(1)).as("c_sw"))
    val ns = csw.groupBy("source")
      .agg(sum("c_sw").as("n_s"), count(lit(1)).as("n_types"))
    val cw = csw.groupBy("wh").agg(sum("c_sw").as("c_w"))
    val n = cw.agg(sum("c_w").as("n"))
    val ps = col("c_sw").cast("double") / col("n_s").cast("double")
    val pc = col("c_w").cast("double") / col("n").cast("double")
    val term = ps * log2(lit(2) * ps / (ps + pc)) +
      pc * log2(lit(2) * pc / (ps + pc))
    csw
      .join(ns, "source")
      .join(cw, "wh")
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s"), col("n_types"), col("n"),
        round(term * lit(1e12)).cast("long").as("tp"), col("c_w"))
      .groupBy("source", "n_s", "n_types", "n")
      .agg(sum("tp").as("sumt"), sum("c_w").as("sumcw"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_types"),
        round(lit(0.5) * col("sumt").cast("double") / lit(1e12)
          + lit(0.5) * (col("n") - col("sumcw")).cast("double")
            / col("n").cast("double"), 6).as("js_bits"))
      .orderBy("source")
  }

  /** q80: source-pair textual overlap — exact Jaccard between the
    * word-trigram shingle SETS of every pair of sources that share at
    * least one shingle. The set-level companion to q79's
    * distributional JS: q79 says "this source's word mix drifted",
    * q80 says "these two sources literally share n-grams" (mirrored
    * boilerplate, cross-posted content, a scrape duplicated under two
    * names). Reuses q22's exact shingle definition
    * ([[TextOps.shingles]] / the shared uncapped oracle CTE), so its
    * numbers are commensurable with the near-dup family.
    *
    * Scale shape: per-source distinct shingle hashes (map-side explode
    * + distinct on the 60-bit hash), then a self-equi-join on the
    * hash: a shingle present in k sources yields k(k−1)/2 pair rows,
    * so the join output is bounded by distinct-shingles × S²/2 and
    * the RESULT by S² — this is a per-domain diagnostic (S in the
    * dozens-to-hundreds), not a per-document operator; union sizes
    * come from the closed form |A∪B| = |A|+|B|−|A∩B|, never a union
    * materialization. */
  def q80SourceJaccard(documents: DataFrame): DataFrame = {
    val srcSh = TextOps.shingles(documents)
      .join(documents.select("doc_id", "source"), "doc_id")
      .select(col("source"), h60(col("s")).as("shh")).distinct()
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val pairs = srcSh.as("a")
      .join(srcSh.as("b"),
        col("a.shh") === col("b.shh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a")),
        "source_a")
      .join(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  def q80Sql: String = {
    def h60(s: String) =
      s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    s"""WITH ${TextOps.shinglesSql},
       |ds AS (SELECT DISTINCT d.source, ${h60("sh.s")} AS shh
       |       FROM sh JOIN documents d USING (doc_id)),
       |sizes AS (SELECT source, count(*) AS n_sh FROM ds GROUP BY 1),
       |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
       |            count(*) AS n_common
       |          FROM ds a JOIN ds b
       |            ON a.shh = b.shh AND a.source < b.source
       |          GROUP BY 1, 2)
       |SELECT source_a, source_b, n_common,
       |  round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common)::DOUBLE, 6)
       |    AS jaccard
       |FROM pairs
       |JOIN sizes sa ON sa.source = source_a
       |JOIN sizes sb ON sb.source = source_b
       |ORDER BY 1, 2""".stripMargin
  }

  /** q85: snapshot-over-snapshot drift — the daily monitoring loop a
    * production corpus runs: did this ingest tick shift the content
    * distribution, and WHERE? Snapshots follow the q73/q75 ingest-tick
    * convention (before = doc_id % BatchMod ≠ 0, after = the full
    * table); the q75 MANIFEST DIFF picks the changed id-buckets first
    * (O(buckets) work), and the expensive distribution pass then reads
    * ONLY documents in changed buckets — unchanged buckets are never
    * tokenized (on a bucket-partitioned corpus layout that is partition
    * pruning; here it is the broadcast semi-join on the bucket key).
    * That scoping is the incremental win: drift cost scales with the
    * ingest tick, not the corpus.
    *
    * Output: one row per CHANGED bucket — doc and token counts on both
    * sides plus js_bits, the Jensen–Shannon divergence between the
    * bucket's before and after unigram distributions (q79's metric,
    * snapshot-over-snapshot instead of source-vs-corpus). Since
    * after ⊇ before, every before-word exists in after, so the
    * absent-word tail is one-sided and closed-form: words new in the
    * batch contribute 0.5·(1 − Σ_{w∈before} q(w)) computed from the
    * before-side rows — only (bucket, word) pairs that exist ever
    * materialize (q79's trick). Same pico-bit integer discipline:
    * each present-word term rounds ONCE to ×1e12 long; all sums are
    * long; one final double expression with pinned association. An
    * all-new bucket (empty before side) degenerates to js = 0.5 by the
    * same formula — no special case. */
  def q85SnapshotDrift(documents: DataFrame, buckets: Int = 64): DataFrame = {
    val isBefore = pmod(col("doc_id"), lit(Provenance.BatchMod)) =!= 0
    val changed = Provenance.manifestDiff(
        documents.filter(isBefore), documents, buckets)
      .select("bucket")
    val tok = documents
      .select(pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        isBefore.cast("long").as("b"),
        explode(split(col("text"), " ")).as("w"))
      .join(broadcast(changed), Seq("bucket"), "left_semi")
      .select(col("bucket"), col("b"), h60(col("w")).as("wh"))
    val cnt = tok.groupBy("bucket", "wh")
      .agg(count(lit(1)).as("c_a"), sum("b").as("c_b"))
    val tot = cnt.groupBy("bucket")
      .agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val dc = documents
      .select(pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        isBefore.cast("long").as("b"))
      .join(broadcast(changed), Seq("bucket"), "left_semi")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_after"), sum("b").as("n_before"))
    val p = col("c_b").cast("double") / col("n_b").cast("double")
    val q = col("c_a").cast("double") / col("n_a").cast("double")
    val term = p * log2(lit(2) * p / (p + q)) +
      q * log2(lit(2) * q / (p + q))
    cnt.join(tot, "bucket")
      .select(col("bucket"), col("n_a"), col("n_b"),
        when(col("c_b") > 0, round(term * lit(1e12)).cast("long"))
          .otherwise(0L).as("tp"),
        when(col("c_b") > 0, col("c_a")).otherwise(0L).as("cwp"))
      .groupBy("bucket", "n_a", "n_b")
      .agg(sum("tp").as("sumt"), sum("cwp").as("sumcw"))
      .join(dc, "bucket")
      .select(col("bucket"), col("n_before"), col("n_after"),
        col("n_b").as("tok_before"), col("n_a").as("tok_after"),
        round(lit(0.5) * col("sumt").cast("double") / lit(1e12)
          + lit(0.5) * (col("n_a") - col("sumcw")).cast("double")
            / col("n_a").cast("double"), 6).as("js_bits"))
      .orderBy("bucket")
  }

  def q85Sql(buckets: Int = 64): String = {
    def h60(s: String) =
      s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    val bm = Provenance.BatchMod
    s"""WITH hb AS (SELECT doc_id % $buckets AS bucket,
       |              ${h60("concat_ws('|', doc_id, text)")} AS h
       |            FROM documents WHERE doc_id % $bm <> 0),
       |bmf AS (SELECT bucket, count(*) AS n_before, bit_xor(h) AS sig_before
       |        FROM hb GROUP BY 1),
       |ha AS (SELECT doc_id % $buckets AS bucket,
       |              ${h60("concat_ws('|', doc_id, text)")} AS h
       |            FROM documents),
       |amf AS (SELECT bucket, count(*) AS n_after, bit_xor(h) AS sig_after
       |        FROM ha GROUP BY 1),
       |chg AS (SELECT coalesce(b.bucket, a.bucket) AS bucket
       |        FROM bmf b FULL JOIN amf a ON b.bucket = a.bucket
       |        WHERE b.sig_before IS DISTINCT FROM a.sig_after
       |           OR b.n_before IS DISTINCT FROM a.n_after),
       |tok AS (SELECT doc_id % $buckets AS bucket,
       |          CASE WHEN doc_id % $bm <> 0 THEN 1 ELSE 0 END AS b,
       |          ${h60("w")} AS wh
       |        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w
       |              FROM documents) u
       |        WHERE doc_id % $buckets IN (SELECT bucket FROM chg)),
       |cnt AS (SELECT bucket, wh, count(*) AS c_a, sum(b)::BIGINT AS c_b
       |        FROM tok GROUP BY 1, 2),
       |tot AS (SELECT bucket, sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b
       |        FROM cnt GROUP BY 1),
       |dc AS (SELECT doc_id % $buckets AS bucket, count(*) AS n_after,
       |         sum(CASE WHEN doc_id % $bm <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_before
       |       FROM documents WHERE doc_id % $buckets IN (SELECT bucket FROM chg)
       |       GROUP BY 1),
       |terms AS (SELECT cnt.bucket, n_a, n_b,
       |    CASE WHEN c_b > 0 THEN CAST(round((
       |      (c_b::DOUBLE / n_b::DOUBLE)
       |        * log2(2 * (c_b::DOUBLE / n_b::DOUBLE)
       |          / ((c_b::DOUBLE / n_b::DOUBLE) + (c_a::DOUBLE / n_a::DOUBLE)))
       |      + (c_a::DOUBLE / n_a::DOUBLE)
       |        * log2(2 * (c_a::DOUBLE / n_a::DOUBLE)
       |          / ((c_b::DOUBLE / n_b::DOUBLE) + (c_a::DOUBLE / n_a::DOUBLE)))
       |    ) * 1e12) AS BIGINT) ELSE 0 END AS tp,
       |    CASE WHEN c_b > 0 THEN c_a ELSE 0 END AS cwp
       |  FROM cnt JOIN tot USING (bucket))
       |SELECT t.bucket, dc.n_before, dc.n_after,
       |  t.n_b AS tok_before, t.n_a AS tok_after,
       |  round(0.5 * sum(tp)::DOUBLE / 1e12
       |    + 0.5 * (t.n_a - sum(cwp))::DOUBLE / t.n_a::DOUBLE, 6) AS js_bits
       |FROM terms t JOIN dc ON dc.bucket = t.bucket
       |GROUP BY t.bucket, dc.n_before, dc.n_after, t.n_b, t.n_a
       |ORDER BY t.bucket""".stripMargin
  }

  def q79Sql: String = {
    def h60(s: String) =
      s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"
    s"""WITH tok AS (
       |  SELECT source, ${h60("w")} AS wh
       |  FROM (SELECT source, unnest(regexp_split_to_array(text, ' ')) AS w
       |        FROM documents)),
       |csw AS (SELECT source, wh, count(*) AS c_sw FROM tok GROUP BY 1, 2),
       |ns AS (SELECT source, sum(c_sw)::BIGINT AS n_s, count(*) AS n_types
       |       FROM csw GROUP BY 1),
       |cw AS (SELECT wh, sum(c_sw)::BIGINT AS c_w FROM csw GROUP BY 1),
       |n AS (SELECT sum(c_w)::BIGINT AS n FROM cw),
       |terms AS (
       |  SELECT csw.source, ns.n_s, ns.n_types, n.n, cw.c_w,
       |    CAST(round((
       |      (c_sw::DOUBLE / n_s::DOUBLE)
       |        * log2(2 * (c_sw::DOUBLE / n_s::DOUBLE)
       |          / ((c_sw::DOUBLE / n_s::DOUBLE) + (c_w::DOUBLE / n::DOUBLE)))
       |      + (c_w::DOUBLE / n::DOUBLE)
       |        * log2(2 * (c_w::DOUBLE / n::DOUBLE)
       |          / ((c_sw::DOUBLE / n_s::DOUBLE) + (c_w::DOUBLE / n::DOUBLE)))
       |    ) * 1e12) AS BIGINT) AS tp
       |  FROM csw JOIN ns USING (source) JOIN cw USING (wh), n)
       |SELECT source, n_s AS n_tokens, n_types,
       |  round(0.5 * sum(tp)::DOUBLE / 1e12
       |    + 0.5 * (any_value(n) - sum(c_w))::DOUBLE
       |      / any_value(n)::DOUBLE, 6) AS js_bits
       |FROM terms GROUP BY source, n_s, n_types
       |ORDER BY source""".stripMargin
  }
}
