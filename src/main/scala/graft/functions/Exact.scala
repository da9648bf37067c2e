package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic, engine-portable aggregation helpers.
  *
  * Double-precision sums are order-dependent under parallel execution, so
  * a grouped `sum(double)` is not reproducible run-to-run — let alone
  * across engines (the correctness oracle re-runs every query in DuckDB
  * and hash-compares values). The synthetic data's measures carry at most
  * two decimal digits, so casting to `decimal(18,4)` is lossless; decimal
  * aggregation is exact integer arithmetic (order-independent, identical
  * in any engine), and the single final decimal→double conversion is
  * correctly rounded in both Spark and DuckDB provided the unscaled value
  * stays below 2^53 (at scale 4 that is ~9×10^11 in data units — far
  * above any sf0.1 group sum).
  *
  * This is also the right 100 TB posture: exact decimal partial aggregates
  * merge associatively, so map-side combine stays enabled and results are
  * stable across retries/AQE re-plans.
  */
object Exact {

  /** Lossless fixed-point view of a ≤2-decimal measure column. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent sum of a ≤2-decimal double column, as double. */
  def sumd(c: Column): Column = sum(dec4(c)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, as double. */
  def avgd(c: Column): Column = sumd(c) / count(c)

  /** SQL fragments for the DuckDB oracle mirroring the helpers above. */
  def sumdSql(col: String): String =
    s"cast(sum(cast($col as decimal(18,4))) as double)"
  def avgdSql(col: String): String =
    s"(${sumdSql(col)} / count($col))"
}
