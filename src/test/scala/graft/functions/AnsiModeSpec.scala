package graft.functions

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ANSI-session robustness: the engine's canonical session runs ANSI
  * off (pandas `errors="coerce"` semantics, GraftSession scaladoc), but
  * the parse expressions are documented to stay correct under an ANSI
  * session too — their casts are regex-guarded / TRY-mode, so malformed
  * input must coerce to null, never throw, with identical results in
  * both modes. This is the contract that lets the library run inside a
  * host application that has ANSI enabled globally. */
class AnsiModeSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  private lazy val ansi: SparkSession = {
    base // ensure shared context exists
    val s = base.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s
  }

  private val dirty = Seq(
    " $-   ", "-", "", "1,234.5", "$42,000", "12.5%", "-3.7%",
    "21 Million", "88.3 Billion", "163 Thousand", "abc", "4 150.00")

  test("parse expressions coerce (not throw) identically under ANSI") {
    assert(ansi.conf.get("spark.sql.ansi.enabled") === "true")
    def results(s: SparkSession): Seq[Seq[Any]] = {
      import s.implicits._
      val df = dirty.toDF("v")
      df.select(
          Parsers.parseNumeric(col("v")).as("num"),
          Parsers.parsePercent(col("v")).as("pct"),
          Parsers.parseCurrency(col("v")).as("cur"),
          Parsers.parseMagnitude(col("v")).as("mag"),
          graft.catalyst.native.parseMagnitude(col("v")).as("mag_native"))
        .collect().toSeq.map(r => (0 until r.length).map(r.get))
    }
    val ansiRows = results(ansi) // would throw on an unguarded bad cast
    assert(ansiRows === results(base),
      "ANSI and non-ANSI sessions must parse identically")
    // sanity on known values through the ANSI session
    val byInput = dirty.zip(ansiRows).toMap
    assert(byInput("21 Million")(3) === 21000000L)
    assert(byInput(" $-   ").forall(_ == null))
    assert(byInput("$42,000")(2) === 42000.0)
  }

  test("classification ladder agrees under ANSI") {
    def labels(s: SparkSession): Seq[String] = {
      import s.implicits._
      Seq(-7.0, -5.0, -1.0, 0.0, 1.0, 5.0, 7.0).toDF("pct")
        .select(Classify.classifyTrend(col("pct"), Classify.ColabLabels))
        .collect().toSeq.map(_.getString(0))
    }
    assert(labels(ansi) === labels(base))
  }
}
