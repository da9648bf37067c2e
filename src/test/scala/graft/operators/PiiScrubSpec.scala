package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q78 PII scrub: redaction must be complete (no residual matches),
  * the accounting must reconcile with the injection harness, and the
  * scrubber must leave clean text byte-identical. */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("scrub removes every match; clean text passes through byte-identical") {
    import spark.implicits._
    val rows = Seq(
      ("contact a.smith+x@corp.example.org now", 1, 0, 0),
      ("call +44-020-7946 then +1-555-0100 twice: +1-555-0100", 0, 3, 0),
      ("hosts 192.168.0.1 and 10.0.0.255, version 1.2 stays", 0, 0, 2),
      ("mixed bob@x.io at 172.16.4.9 dial +1-555-1234", 1, 1, 1),
      ("bad octets 999.999.999.999 and 256.1.1.1 are not IPs", 0, 0, 0),
      ("edge octets 0.0.0.0 and 255.255.255.255 are", 0, 0, 2),
      ("no pii here, just words and 42 numbers", 0, 0, 0))
      .toDF("text", "ne", "np", "ni")
    val (ne, np, ni) = PiiScrub.piiCounts(col("text"))
    val out = rows.select(col("text"), col("ne"), col("np"), col("ni"),
      ne.as("ge"), np.as("gp"), ni.as("gi"), PiiScrub.scrub(col("text")).as("s"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("ge") === r.getAs[Int]("ne"), r.getAs[String]("text"))
      assert(r.getAs[Int]("gp") === r.getAs[Int]("np"), r.getAs[String]("text"))
      assert(r.getAs[Int]("gi") === r.getAs[Int]("ni"), r.getAs[String]("text"))
      val s = r.getAs[String]("s")
      if (r.getAs[Int]("ne") + r.getAs[Int]("np") + r.getAs[Int]("ni") == 0)
        assert(s === r.getAs[String]("text"), "clean text must not change")
    }
    // a second scrub pass finds nothing: redaction is complete
    val residual = rows.select(PiiScrub.scrub(col("text")).as("s"))
      .select(PiiScrub.piiCounts(col("s"))._1.as("e"),
        PiiScrub.piiCounts(col("s"))._2.as("p"),
        PiiScrub.piiCounts(col("s"))._3.as("i"))
      .agg(sum(col("e") + col("p") + col("i"))).collect()(0).getLong(0)
    assert(residual === 0L)
  }

  test("q78 accounting reconciles with the injection harness") {
    val docs = Tables.load(spark, sf, "documents")
    val out = PiiScrub.q78PiiScrub(docs).collect()
    val nInjected = docs.filter(pmod(col("doc_id"), lit(PiiScrub.InjectMod)) === 0).count()
    assert(out.map(_.getLong(2)).sum === nInjected)
    // exactly one match of each class per injected doc, none elsewhere
    assert(out.map(_.getLong(3)).sum === nInjected, "emails")
    assert(out.map(_.getLong(4)).sum === nInjected, "phones")
    assert(out.map(_.getLong(5)).sum === nInjected, "ips")
    assert(out.forall(r => r.getLong(2) > 0 || (r.getLong(3) + r.getLong(4)
      + r.getLong(5) + r.getLong(6)) == 0),
      "sources without injections must report zero matches and zero chars removed")
    // chars_removed is positive wherever something was redacted
    assert(out.filter(_.getLong(2) > 0).forall(_.getLong(6) > 0L))
  }
}
