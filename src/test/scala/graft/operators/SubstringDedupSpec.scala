package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.scalatest.funsuite.AnyFunSuite

/** q86 repeated-substring coverage: hand-computed fixtures (shared span,
  * overlap merge, short docs) plus bounds + exact-dup behavior on the
  * real corpus. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    SubstringDedup.q86SubstringDups(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
  }

  test("hand-computed: one shared 8-gram covers 8 of 10 tokens") {
    val out = run(Seq(
      (1L, "a b c d e f g h i j"),   // shares positions-1 gram with doc 2
      (2L, "a b c d e f g h x y"),
      (3L, "k l m n o p q r s t"),   // fully unique
      (4L, "p q")))                  // shorter than k: no grams at all
    assert(out(1L) === ((10L, 1L, 8L, 0.8)))
    assert(out(2L) === ((10L, 1L, 8L, 0.8)))
    assert(out(3L) === ((10L, 0L, 0L, 0.0)))
    assert(out(4L) === ((2L, 0L, 0L, 0.0)))
  }

  test("overlapping dup spans merge: 9-token shared run counts 9, not 16") {
    val out = run(Seq(
      (1L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 u1"),
      (2L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 u2")))
    // positions 1 and 2 are both cross-doc dups; intervals [1,8] and
    // [2,9] merge to [1,9]
    assert(out(1L) === ((10L, 2L, 9L, 0.9)))
    assert(out(2L) === ((10L, 2L, 9L, 0.9)))
  }

  test("identical docs are fully covered; within-doc repetition alone is not a dup") {
    val out = run(Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      // doc 3 repeats ITS OWN gram twice but shares nothing cross-doc:
      // within-doc repetition is q61's business, not a duplication event
      (3L, "y1 y2 y3 y4 y5 y6 y7 y8 y1 y2 y3 y4 y5 y6 y7 y8")))
    assert(out(1L) === ((10L, 3L, 10L, 1.0)))
    assert(out(2L) === ((10L, 3L, 10L, 1.0)))
    assert(out(3L)._4 === 0.0)
  }

  test("q90: planted boilerplate tops the miner with its text recovered") {
    import spark.implicits._
    val header = "this document is provided as is without any warranty"  // 9 tokens
    val docs = (1L to 6L).map(i => (i, s"$header unique$i tail$i words$i here$i")) :+
      (7L, "a completely different document with nothing shared at all")
    val out = SubstringDedup.q90Boilerplate(docs.toDF("doc_id", "text")).collect()
    assert(out.nonEmpty && out.length <= 20)
    // the 8-gram prefix of the planted header is in all 6 docs — rank 1
    val topRow = out.head
    assert(topRow.getLong(2) === 6L, "df_docs of the planted header")
    assert(header.split(" ").take(8).mkString(" ") === topRow.getString(1) ||
      topRow.getString(1).startsWith("document is provided"),
      s"unexpected top gram: ${topRow.getString(1)}")
    // df is non-increasing down the report
    assert(out.map(_.getLong(2)).sliding(2).forall { case Array(a, b) => a >= b })
    // the fully-unique doc contributes no gram
    assert(!out.exists(_.getString(1).contains("completely different")))
  }

  test("real corpus: bounds hold and exact-dup docs are fully covered") {
    val docs = Tables.load(spark, sf, "documents")
    val out = SubstringDedup.q86SubstringDups(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, covered, frac) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(covered <= n && frac >= 0.0 && frac <= 1.0)
    }
    // every doc q21 reports as an exact multi-copy must be 100% covered
    // (when it has at least k tokens)
    val dupIds = TextOps.q21ExactDedup(docs)
      .filter("n_copies >= 2").select("keeper").collect().map(_.getLong(0)).toSet
    val byId = out.map(r => r.getLong(0) -> r).toMap
    dupIds.foreach { id =>
      val r = byId(id)
      if (r.getLong(1) >= SubstringDedup.DefaultK)
        assert(r.getDouble(4) === 1.0, s"doc $id")
    }
  }
}
