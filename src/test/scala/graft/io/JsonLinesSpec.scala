package graft.io

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** JSONL source: declared-schema parse, corrupt-line capture (count your
  * garbage, never fail the job), and round-trip through the writer. */
class JsonLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("permissive read parses good lines and captures corrupt ones") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta"}""",
      """{"doc_id": 2, "text": "gamma"}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      """not json at all""",
      """{"doc_id": 5, "text": "epsilon"}""")
    Files.writeString(dir.resolve("part-0.jsonl"), lines.mkString("\n"))

    val df = JsonLines.read(spark, dir.toString, docSchema)
    val (clean, bad) = JsonLines.partitionCorrupt(df)
    assert(clean.columns.toSeq === Seq("doc_id", "text"))
    val got = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "alpha beta", 2L -> "gamma", 5L -> "epsilon"))
    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines.size === 2)
    assert(badLines.exists(_.contains("missing comma")))
    assert(badLines.contains("not json at all"))
  }

  test("round-trip: write then read preserves rows; corrupt column absent") {
    import spark.implicits._
    val docs = Seq((10L, "one two"), (11L, "three")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-jsonl-rt").resolve("out").toString
    JsonLines.write(docs, dir, singleFile = true)
    val back = JsonLines.read(spark, dir, docSchema)
    val (clean, bad) = JsonLines.partitionCorrupt(back)
    assert(bad.count() === 0)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((10L, "one two"), (11L, "three")))
  }
}
