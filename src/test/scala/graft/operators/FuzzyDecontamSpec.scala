package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.scalatest.funsuite.AnyFunSuite

/** q88 fuzzy decontamination: planted cross-split near-dup fixture,
  * side-membership invariants on the real corpus, and consistency with
  * the q27 within-corpus pair set. */
class FuzzyDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def decile(docId: Long): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16) % 10

  test("planted near-dup across the split is flagged; within-side pairs are not") {
    import spark.implicits._
    val evalId = (0L to 2000L).find(decile(_) <= 1).get
    val Seq(t1, t2) = (0L to 2000L).filter(decile(_) >= 2).take(2)
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val docs = Seq(
      (evalId, base),                        // held-out original
      (t1, base.replace("w16", "zz")),       // train-side near-paraphrase
      (t2, base.replace("w16", "zz")))       // identical TRAIN pair: must not appear
      .toDF("doc_id", "text")
    val out = Contamination.q88FuzzyDecontam(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // both train docs near-match the eval doc; the train-train identity
    // pair contributes nothing (it is dedup's business, not leakage)
    assert(out.keySet === Set(t1, t2))
    out.values.foreach { case (n, j, best) =>
      assert(n === 1L && best === evalId && j > 0.8)
    }
  }

  test("real corpus: sides are respected and pairs exist in q27's pair set") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Contamination.q88FuzzyDecontam(docs).collect()
    assert(out.nonEmpty, "corpus should contain at least one cross-split near-dup")
    out.foreach { r =>
      assert(decile(r.getLong(0)) >= 2, "flagged doc must be train-side")
      assert(decile(r.getLong(3)) <= 1, "best match must be held-out-side")
      assert(r.getDouble(2) >= 0.2 && r.getDouble(2) <= 1.0)
    }
    // every reported best pair is a member of the symmetric q27 pair set
    val q27 = Fuzzy.q27LshDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(3))
      assert(q27.contains((math.min(a, b), math.max(a, b))),
        s"pair ($a,$b) missing from q27")
    }
  }
}
