package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction with accounting — the standard pre-training scrub
  * pass (emails, phone numbers, IPv4 addresses → typed placeholder
  * tags), reported per source. The reference pipeline has no PII
  * surface (its corpus is market metadata); this is a beyond-reference
  * training-data operator.
  *
  * The patterns are deliberately in the RE2 ∩ java.util.regex common
  * dialect (character classes, bounded repetition, non-capturing
  * groups, `\b` — no lookarounds, no backreferences), so the exact
  * same pattern string runs in Spark codegen and in the DuckDB oracle.
  *
  * The synthetic corpora contain no natural PII, so the query carries
  * a deterministic injection harness (every doc_id % [[InjectMod]] == 0
  * gets one email + one phone + one IP appended, all derived from
  * doc_id) — the same planted-fixture pattern as q73's BatchMod split.
  * The harness is part of the query contract and mirrored in the
  * oracle; production use calls [[scrub]]/[[piiCounts]] on raw text.
  *
  * Scale shape: entirely map-side — regex match/replace is row-local
  * codegen (one `RegExpReplace` chain, no UDF), and the only shuffle
  * is the final per-source COUNT/SUM aggregate with map-side partials.
  * At 100 TB this is the cheapest class of pass: one scan, no joins,
  * no state. */
object PiiScrub {

  val InjectMod = 50

  val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** E.164-lite (`+CC-NNN-NNNN`) — the harness's injected format, NOT a
    * general phone detector: real-world formats ((555) 123-4567, dotted,
    * bare national) are out of scope here because a broad digit-run
    * pattern over arbitrary corpus text trades precision for recall in
    * ways a deployment must tune per locale. Production swaps in its own
    * locale-aware pattern set through the same [[scrub]] chain. */
  val PhonePat = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** Octet-valid IPv4 (each octet 0–255, no leading-zero ambiguity
    * beyond plain `[1-9]?[0-9]`): `999.999.999.999` is rejected. The
    * alternation is RE2 ∩ java.regex like the others, and since both
    * engines run the identical pattern string, narrowing it keeps
    * oracle parity automatically. */
  val Ipv4Pat = "\\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\.){3}" +
    "(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\\b"

  /** Redact all three PII classes from a text column. Email first:
    * its local part may contain digits/dots that the other patterns
    * could otherwise clip (order is part of the contract). */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      Ipv4Pat, "<IP>")

  /** Per-class match counts on the UNSCRUBBED text. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailPat)),
     regexp_count(text, lit(PhonePat)),
     regexp_count(text, lit(Ipv4Pat)))

  /** q78: per-source scrub report over the deterministically-injected
    * corpus: docs, injected docs, matches per class, and how many
    * characters redaction removed (original minus scrubbed length —
    * the byte-accounting a storage-budgeted rewrite pass tracks). */
  /** The deterministic injection harness as a column: every
    * doc_id % [[InjectMod]] == 0 doc gets one email + one phone + one
    * IP appended, all derived from doc_id. Shared by q78 and the
    * composed q84 scrub stage (and mirrored by [[augSql]]). */
  def augmented: Column = augmentedWith(InjectMod)

  /** [[augmented]] at a caller-chosen injection modulus (q137 uses a
    * denser one so every batch class carries PII to redact). */
  def augmentedWith(mod: Long): Column =
    when(pmod(col("doc_id"), lit(mod)) === 0, concat(col("text"),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0.1")))
      .otherwise(col("text"))

  /** Oracle-side mirror of [[augmented]] (an expression over a scope
    * exposing doc_id and text). Deliberately ONE line: a multi-line
    * fragment whose continuation lines start with `||` gets mangled by
    * the EMBEDDING query's stripMargin (it strips the first pipe). */
  private[operators] def augSql: String = augSqlWith(InjectMod)

  private[operators] def augSqlWith(mod: Long): String =
    s"CASE WHEN doc_id % $mod = 0 THEN text || ' reach user' || " +
      "CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
      "' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE text END"

  /** Oracle-side [[scrub]]: the three regexp_replace passes in order. */
  private[operators] def scrubSql(src: String): String = {
    def rep(s: String, pat: String, tag: String) =
      s"regexp_replace($s, '$pat', '$tag', 'g')"
    rep(rep(rep(src, EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"), Ipv4Pat, "<IP>")
  }

  def q78PiiScrub(documents: DataFrame): DataFrame = {
    val injected = pmod(col("doc_id"), lit(InjectMod)) === 0
    val base = documents.select(col("doc_id"), col("source"),
      injected.cast("long").as("inj"), augmented.as("t"))
    val (ne, np, ni) = piiCounts(col("t"))
    base
      .select(col("source"), col("inj"),
        ne.cast("long").as("ne"), np.cast("long").as("np"),
        ni.cast("long").as("ni"),
        (length(col("t")) - length(scrub(col("t")))).cast("long").as("cr"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("inj").as("n_injected"),
        sum("ne").as("n_email"), sum("np").as("n_phone"),
        sum("ni").as("n_ip"), sum("cr").as("chars_removed"))
      .orderBy("source")
  }

  def q78Sql: String = {
    val scrubbed = scrubSql("t")
    s"""WITH aug AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % $InjectMod = 0 THEN 1 ELSE 0 END AS inj,
       |    $augSql AS t
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, sum(inj)::BIGINT AS n_injected,
       |  sum(len(regexp_extract_all(t, '$EmailPat')))::BIGINT AS n_email,
       |  sum(len(regexp_extract_all(t, '$PhonePat')))::BIGINT AS n_phone,
       |  sum(len(regexp_extract_all(t, '$Ipv4Pat')))::BIGINT AS n_ip,
       |  sum(len(t) - len($scrubbed))::BIGINT AS chars_removed
       |FROM aug GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
