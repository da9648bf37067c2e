package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O11: the 5-way trend-classification ladder (`classify_trend`,
  * reference crypto_etl_pipeline.py:218-234 / crypto_etl_colab.py:93-111)
  * as a pure `when/otherwise` expression tree — codegen'd, no UDF.
  *
  * Input is the RAW percentage (e.g. `3.2` = 3.2%); the ladder divides by
  * 100 first, exactly like the reference. Boundary semantics (verified in
  * SURVEY.md §2.2): exactly ±1% → stable; exactly ±5% → strong. A null
  * percentage falls through every comparison to `otherwise` → stable,
  * which reproduces pandas NaN-comparison behavior.
  */
object Classify {

  /** Colab (golden) sentence-case labels. */
  val ColabLabels: TrendLabels = TrendLabels(
    strongUp = "Tendencia fuerte alcista",
    moderateUp = "Tendencia moderada alcista",
    strongDown = "Tendencia fuerte bajista",
    moderateDown = "Tendencia moderada bajista",
    stable = "Tendencia estable")

  /** Airflow-variant uppercase labels (crypto_etl_pipeline.py:225-234). */
  val AirflowLabels: TrendLabels = TrendLabels(
    strongUp = "TENDENCIA FUERTE ALCISTA",
    moderateUp = "TENDENCIA MODERADA ALCISTA",
    strongDown = "TENDENCIA FUERTE BAJISTA",
    moderateDown = "TENDENCIA MODERADA BAJISTA",
    stable = "TENDENCIA ESTABLE")

  case class TrendLabels(strongUp: String, moderateUp: String,
                         strongDown: String, moderateDown: String,
                         stable: String)

  def classifyTrend(rawPct: Column,
                    labels: TrendLabels = ColabLabels): Column = {
    val p = rawPct / 100
    when(p >= 0.05, lit(labels.strongUp))
      .when(p > 0.01, lit(labels.moderateUp))
      .when(p <= -0.05, lit(labels.strongDown))
      .when(p < -0.01, lit(labels.moderateDown))
      .otherwise(lit(labels.stable))
  }
}
