package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics per FIXTURES.md §4: exactly ±1% → stable,
  * exactly ±5% → strong, null → stable. */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("threshold ladder boundaries") {
    val cases: Seq[(Option[Double], String)] = Seq(
      Some(5.0) -> "Tendencia fuerte alcista",
      Some(4.999) -> "Tendencia moderada alcista",
      Some(1.0) -> "Tendencia estable",
      Some(1.001) -> "Tendencia moderada alcista",
      Some(-1.0) -> "Tendencia estable",
      Some(-1.001) -> "Tendencia moderada bajista",
      Some(-5.0) -> "Tendencia fuerte bajista",
      Some(-4.999) -> "Tendencia moderada bajista",
      Some(0.0) -> "Tendencia estable",
      None -> "Tendencia estable")
    val out = cases.map(_._1).toDF("pct")
      .select(Classify.classifyTrend(col("pct")).as("t"))
      .collect().toSeq.map(_.getString(0))
    assert(out === cases.map(_._2))
  }

  test("airflow label variant is uppercase") {
    val out = Seq(6.0).toDF("pct")
      .select(Classify.classifyTrend(col("pct"), Classify.AirflowLabels))
      .head().getString(0)
    assert(out === "TENDENCIA FUERTE ALCISTA")
  }
}
