package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bias-adjusted (Fisher) sample skewness and excess kurtosis — the
  * statistics pandas `skew()`/`kurt()` report and therefore what the
  * reference's ydata-profiling reports contain (SURVEY §2.3 A8 ⚠:
  * Spark's builtin `skewness`/`kurtosis` are population g1/g2, the one
  * stat kind that did not match the reference's reports).
  *
  * The corrections are closed-form in (n, g1, g2):
  *   G1 = g1 · √(n(n−1)) / (n−2)
  *   G2 = ((n+1)·g2 + 6) · (n−1) / ((n−2)(n−3))
  * so they compose as pure Column arithmetic over Spark's builtin
  * moment aggregates — fully partial-aggregatable and codegen'd, no
  * custom UDAF buffer needed (the builtins already carry the moment
  * sketch; a hand-rolled Aggregator would recompute the same moments
  * outside Tungsten). Verified to 1 ulp against pandas on the
  * reference API fixture (ProfilerSpec).
  *
  * Undefined cases mirror pandas: G1 needs n ≥ 3, G2 needs n ≥ 4 —
  * null otherwise (pandas returns NaN).
  */
object Moments {

  /** pandas `Series.skew()`: Fisher–Pearson standardized third moment
    * with sample-size bias correction. */
  def skewG1(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 3, skewness(c) * sqrt(n * (n - lit(1))) / (n - lit(2)))
  }

  /** pandas `Series.kurt()`: bias-adjusted Fisher excess kurtosis.
    * Spark's `kurtosis` is already the EXCESS population g2. */
  def kurtG2(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 4,
      ((n + lit(1)) * kurtosis(c) + lit(6)) * (n - lit(1))
        / ((n - lit(2)) * (n - lit(3))))
  }
}
