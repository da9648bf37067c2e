package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.scalatest.funsuite.AnyFunSuite

/** q82 n-gram novelty: bounds, the monotone-in-n shape on the real
  * corpus, and a hand-computed fixture where every count is checkable
  * on paper. */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def decile(docId: Long): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16) % 10

  test("novelty is bounded, n_unseen <= n_val, and non-decreasing in n on the corpus") {
    val out = Novelty.q82NgramNovelty(Tables.load(spark, sf, "documents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3))
    out.foreach { case (_, nv, nu, rate) =>
      assert(nu <= nv && rate >= 0.0 && rate <= 1.0)
    }
    // longer n-grams are never LESS novel than shorter ones: every
    // seen n-gram implies its (n-1)-gram prefix was seen too
    assert(out.sliding(2).forall { case Array(a, b) => a._4 <= b._4 })
  }

  test("hand-computed fixture: exact counts at every level") {
    import spark.implicits._
    // find ids landing in the needed deciles of q51's hash split
    val trainId = (0L to 2000L).find(decile(_) >= 2).get
    val valIds = (0L to 2000L).filter(decile(_) == 1).take(2)
    val docs = Seq(
      (trainId, "a b c d"),   // train
      (valIds(0), "a b c d"), // val, verbatim leak of the train doc
      (valIds(1), "x y z"))   // val, fully novel
      .toDF("doc_id", "text")
    val out = Novelty.q82NgramNovelty(docs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) === ((7L, 3L, 0.428571)))  // {a b c d x y z}, unseen {x y z}
    assert(out(2) === ((5L, 2L, 0.4)))       // {ab bc cd xy yz}, unseen {xy yz}
    assert(out(3) === ((3L, 1L, 0.333333)))  // {abc bcd xyz}, unseen {xyz}
  }
}
