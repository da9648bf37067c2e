package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Deterministic, engine-portable aggregation helpers.
  *
  * Double-precision sums are order-dependent under parallel execution, so
  * a grouped `sum(double)` is not reproducible run-to-run — let alone
  * across engines (the correctness oracle re-runs every query in DuckDB
  * and hash-compares values). The synthetic data's measures carry at most
  * two decimal digits, so casting to `decimal(18,4)` is lossless; decimal
  * aggregation is exact integer arithmetic (order-independent, identical
  * in any engine).
  *
  * The single final decimal→double conversion goes THROUGH THE EXACT
  * DECIMAL STRING ([[d2d]]): engines' native decimal→double casts agree
  * only while the unscaled value stays below 2^53 (DuckDB computes
  * unscaled·10^-scale in floating point — two roundings), and a scale-6
  * sum crosses that line at sf1 (found by the 10× scale rehearsal: q01's
  * sum_disc_price differed in the 16th significant digit). Every
  * mainstream engine parses a plain decimal string with correctly-rounded
  * IEEE semantics (Java `Double.parseDouble`, DuckDB fast_float), so the
  * string-mediated cast is bit-identical at ANY magnitude.
  *
  * This is also the right 100 TB posture: exact decimal partial aggregates
  * merge associatively, so map-side combine stays enabled and results are
  * stable across retries/AQE re-plans.
  */
object Exact {

  /** Lossless fixed-point view of a ≤2-decimal measure column. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Engine-portable decimal→double: via the exact decimal string, so
    * the one inexact step is a correctly-rounded IEEE 754 parse in every
    * engine — magnitude-independent, unlike native decimal→double. */
  def d2d(c: Column): Column = c.cast(StringType).cast(DoubleType)

  /** Order-independent sum of a ≤2-decimal double column, as double. */
  def sumd(c: Column): Column = d2d(sum(dec4(c)))

  /** Order-independent mean: exact decimal sum / count, as double. */
  def avgd(c: Column): Column = sumd(c) / count(c)

  /** SQL fragments for the DuckDB oracle mirroring the helpers above. */
  def d2dSql(expr: String): String =
    s"cast(cast(($expr) as varchar) as double)"
  def sumdSql(col: String): String =
    d2dSql(s"sum(cast($col as decimal(18,4)))")
  def avgdSql(col: String): String =
    s"(${sumdSql(col)} / count($col))"
}
