package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Column-level parse/cast operators for dirty human-formatted numerics.
  *
  * Re-expresses the reference's pandas cleaning (SURVEY.md §2.2, O4–O8;
  * reference sites crypto_etl_pipeline.py:100-191, crypto_etl_colab.py:
  * 164-230) as pure Catalyst `Column` expressions — no UDFs, so every
  * parser participates in whole-stage codegen and predicate pushdown.
  *
  * All parsers are null-coercing ("errors=coerce"): malformed input →
  * null. Casts are guarded by a numeric-shape regex so the semantics are
  * identical under ANSI and non-ANSI sessions.
  */
object Parsers {

  /** Cast to double, null on malformed input — a TRY-mode Cast, the
    * exact engine analogue of pandas `to_numeric(errors="coerce")`.
    * One codegen'd scan per value and safe under ANSI sessions (an
    * earlier regex-guard formulation cost a second regex pass per
    * value — measurable at 600 k rows). */
  def toDoubleOrNull(c: Column): Column =
    ColumnBridge.column(
      Cast(ColumnBridge.expression(c), DoubleType, None, EvalMode.TRY))

  /** O5: strip thousands separators, then coerce-cast.
    * `"36,456.94"` → 36456.94; `" $-   "`-derived garbage → null.
    * Reference: crypto_etl_pipeline.py:159-164. */
  def parseNumeric(c: Column): Column =
    toDoubleOrNull(regexp_replace(c, ",", ""))

  /** O6: `"0.40%"` → 0.004 (strip `%`, cast, divide by 100).
    * Reference: crypto_etl_pipeline.py:167-171. */
  def parsePercent(c: Column): Column =
    toDoubleOrNull(regexp_replace(c, "%", "")) / 100

  /** O7: `"$22,801,222,945.00 "` → 2.2801222945e10 (strip `[$, ]`).
    * Reference: crypto_etl_pipeline.py:174-179. */
  def parseCurrency(c: Column): Column =
    toDoubleOrNull(regexp_replace(c, "[$, ]", ""))

  /** O8: magnitude-suffix parser (`clean_total_supply`,
    * crypto_etl_pipeline.py:100-127). Semantics confirmed against the
    * golden CSV (SURVEY.md §2.7):
    *   - null / `""` / `"-"` → null
    *   - strip `,`, `$`, and all spaces
    *   - `"<x>Billion"` → long(x·1e9), `"<x>Million"` → long(x·1e6)
    *   - bare number → long(x)  (truncation toward zero, like `int()`)
    *   - anything else — including the `"Thousand"` suffix the reference
    *     never handles — → null
    */
  def parseMagnitude(c: Column): Column = {
    val s = regexp_replace(c, "[,$ ]", "")
    def num(suffix: String): Column =
      toDoubleOrNull(regexp_replace(s, suffix + "$", ""))
    when(c.isNull || s === "" || s === "-", lit(null).cast(LongType))
      .when(s.rlike("Billion$"), (num("Billion") * 1e9).cast(LongType))
      .when(s.rlike("Million$"), (num("Million") * 1e6).cast(LongType))
      .otherwise(toDoubleOrNull(s).cast(LongType))
  }
}
