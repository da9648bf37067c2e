package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Micro-fixtures from the quirk census (FIXTURES.md §4, SURVEY.md §2.7). */
class ParsersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runD(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                   inputs: Seq[String]): Seq[Option[Double]] =
    inputs.toDF("v").select(f(col("v")).as("r"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("parseNumeric: commas stripped, sentinels coerce to null") {
    assert(runD(Parsers.parseNumeric, Seq("36,456.94", "1.00", " $-   ", "-", "", "abc"))
      === Seq(Some(36456.94), Some(1.0), None, None, None, None))
  }

  test("parsePercent: strip %, divide by 100") {
    assert(runD(Parsers.parsePercent, Seq("0.40%", "-1.70%", "-", ""))
      === Seq(Some(0.004), Some(-0.017), None, None))
  }

  test("parseCurrency: strip [$, ]") {
    assert(runD(Parsers.parseCurrency, Seq("$22,801,222,945.00 ", "$1,000.00 ", "-"))
      === Seq(Some(2.280122294500e10), Some(1000.0), None))
  }

  test("parseMagnitude: full quirk table") {
    val cases = Seq(
      "21 Million" -> Some(21000000L),
      "88.3 Billion" -> Some(88300000000L),
      "163 Thousand" -> None, // unhandled suffix, reference quirk
      "-" -> None,
      "" -> None,
      "1,234" -> Some(1234L),
      "$5 Million" -> Some(5000000L),
      "2.5" -> Some(2L), // int() truncation toward zero
      "abc" -> None)
    val out = cases.map(_._1).toDF("v")
      .select(Parsers.parseMagnitude(col("v")).as("r"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out === cases.map(_._2))
  }
}
