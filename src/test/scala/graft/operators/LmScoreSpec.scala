package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q77 LM perplexity gate: the model must assign high cross-entropy to
  * out-of-distribution text, the integer accounting must be exact, and
  * the result must be partition-order-free (the micro-bits contract). */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("a planted gibberish doc is flagged; its source's avg rises") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    // every bigram of the plant occurs exactly once in the corpus →
    // maximal surprisal under the corpus-trained model
    val gibberish = (1 to 60).map(i => s"zxq${i}v").mkString(" ")
    val planted = docs.unionByName(
      Seq((999999L, gibberish, "srcplant")).toDF("doc_id", "text", "source"))
    val out = LmScore.q77LmPerplexity(planted).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val (nDocs, nBg, avgBits, nFlagged) = out("srcplant")
    assert(nDocs === 1L && nBg === 59L)
    assert(nFlagged === 1L, s"gibberish at $avgBits bits/token must be flagged")
    // it must sit clearly above every natural source's average. The
    // ceiling is vocabulary-bound: a once-seen bigram costs
    // log2((c1+V)/2) ≈ log2((V+1)/2) ≈ 5.5 bits at this corpus's
    // V ≈ 90, against natural averages ≈ 4.9 — so the margin is real
    // but necessarily sub-bit on a ~100-word synthetic vocabulary.
    out.removed("srcplant").values.foreach { case (_, _, a, _) =>
      assert(avgBits > a + 0.4, s"plant $avgBits vs natural $a")
    }
  }

  test("bigram accounting is exact: sum(n_bigrams) = sum(n_tokens - 1) over scored docs") {
    val docs = Tables.load(spark, sf, "documents")
    val expected = docs
      .select(size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 2)
      .agg(sum(col("n") - 1)).collect()(0).getLong(0)
    val got = LmScore.q77LmPerplexity(docs)
      .agg(sum("n_bigrams")).collect()(0).getLong(0)
    assert(got === expected)
  }

  test("flag count is monotone in the threshold; avg_bits is threshold-free") {
    val docs = Tables.load(spark, sf, "documents")
    val loose = LmScore.q77LmPerplexity(docs, flagBits = 4.95).collect()
    val tight = LmScore.q77LmPerplexity(docs, flagBits = 5.05).collect()
    val looseFlags = loose.map(_.getLong(4)).sum
    val tightFlags = tight.map(_.getLong(4)).sum
    assert(tightFlags <= looseFlags)
    assert(looseFlags > 0, "4.95 must flag the measured ~3-8% tail")
    assert(loose.map(r => (r.getString(0), r.getDouble(3))).toSeq ===
      tight.map(r => (r.getString(0), r.getDouble(3))).toSeq,
      "avg_bits must not depend on the flag threshold")
  }

  test("partition-order-free: 13-partition shuffle reproduces the 1-partition result") {
    val docs = Tables.load(spark, sf, "documents")
    val a = LmScore.q77LmPerplexity(docs.repartition(13)).collect().toSeq
    val b = LmScore.q77LmPerplexity(docs.coalesce(1)).collect().toSeq
    assert(a === b, "micro-integer accounting must be partition-order invariant")
  }

  test("q81 bands partition the scored docs; band edges are exact integer cuts") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val out = LmScore.q81QualityCalibration(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // every scored doc lands in exactly one band
    assert(out.map(_._2).sum === LmScore.perDocBits(docs).count())
    out.foreach { case (band, _, avgBits, avgQual) =>
      // token-weighted avg_bits sits inside the band's own doc range
      // only loosely (weighting differs), but the band cut itself is
      // exact: band = floor(10 * bits), so avgBits of members is
      // within (band/10 - 0.1, band/10 + 0.2) for 0.1-wide bands
      assert(avgBits > band / 10.0 - 0.1 && avgBits < band / 10.0 + 0.2,
        s"band $band avg_bits $avgBits")
      assert(avgQual >= 0.0 && avgQual <= 1.2, s"quality ladder range: $avgQual")
    }
    assert(out.map(_._1).sorted.toSeq === out.map(_._1).toSeq, "ordered by band")
    // a planted gibberish doc must land in a strictly higher band than
    // the corpus median band
    val gib = (1 to 60).map(i => s"vvq${i}z").mkString(" ")
    val planted = docs.select("doc_id", "text", "source").unionByName(
      Seq((888888L, gib, "src0")).toDF("doc_id", "text", "source"))
    val bands = LmScore.q81QualityCalibration(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bands.map(_._1).max > out.map(_._1).max,
      "the gibberish doc must open a band above the natural corpus")
  }

  test("boundary margin: no model surprisal sits near a .5 micro-bit rounding edge") {
    // Cross-engine exposure (documented at the round(×1e6) in
    // perDocBits): Spark's log2 and DuckDB's std::log2 may differ in the
    // last ulp, which only matters if some -log2((c12+1)/(c1+V))·1e6
    // lands within ~1e-9 of a .5 boundary (the ulp of log2 near 5 bits,
    // ×1e6). This certifies the shipped corpus keeps a margin ≥100×
    // that ulp scale (measured: 5.15e-5 at sf0.001) — turning the risk
    // into a measured one (a future corpus that trips this assertion
    // needs the fixed-point-log discipline, not just the comment).
    val docs = Tables.load(spark, sf, "documents")
    val bg = docs
      .select(split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(a)-1), i -> struct(a[i-1] AS w1, a[i] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val v = bg.select(count_distinct(col("w2"))).collect()(0).getLong(0)
    val counts = c12.groupBy("w1").agg(sum("c12").as("c1"))
      .join(c12, "w1")
      .select("c12", "c1").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.nonEmpty)
    val minMargin = counts.map { case (n12, n1) =>
      val micro = -math.log((n12 + 1).toDouble / (n1 + v)) / math.log(2.0) * 1e6
      math.abs(micro - math.floor(micro) - 0.5)
    }.min
    assert(minMargin > 1e-7,
      f"surprisal within $minMargin%.2e micro-bits of a rounding boundary")
  }

  test("plan: scoring join is an equi-join on the bigram hash; scalar V broadcasts") {
    val df = LmScore.q77LmPerplexity(Tables.load(spark, sf, "documents"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    val scoreJoin = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[bgh#\\d+L?\\]".r
    assert(scoreJoin.findFirstIn(p).isDefined, "no bgh equi-join found:\n" + p)
    // the only nested-loop join is the 1-row vocabulary-size broadcast
    p.split("\n").filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.trim.matches(".*BroadcastNestedLoopJoin Build(Left|Right), (Inner|Cross)$"),
        "a conditioned BNLJ appeared in the LM plan:\n" + p)
    }
  }
}
