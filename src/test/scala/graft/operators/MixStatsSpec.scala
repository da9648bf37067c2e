package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q79 source-mix divergence: JS must be bounded, near zero for
  * same-distribution sources, near one bit for a disjoint-vocabulary
  * plant, exactly accounted, and partition-order-free. */
class MixStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("JS is in [0,1]; natural sources cluster low; disjoint plant scores high") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    // a source whose vocabulary never appears elsewhere: JS → ~1 bit
    val alien = (1 to 200).map(i => s"qqz${i}x").mkString(" ")
    val planted = docs.unionByName(
      Seq((999999L, alien, "srcdiv")).toDF("doc_id", "text", "source"))
    val out = MixStats.q79SourceDivergence(planted).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    out.values.foreach(js => assert(js >= 0.0 && js <= 1.0))
    val natural = out.removed("srcdiv")
    assert(natural.values.max < 0.2,
      s"same-generator sources must sit near the corpus mix: $natural")
    assert(out("srcdiv") > 0.8,
      s"disjoint vocabulary must approach the 1-bit JS ceiling: ${out("srcdiv")}")
  }

  test("token accounting: n_tokens sums to the corpus token count") {
    val docs = Tables.load(spark, sf, "documents")
    val out = MixStats.q79SourceDivergence(docs)
    val expected = docs.select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(out.agg(sum("n_tokens")).collect()(0).getLong(0) === expected)
    // types never exceed tokens
    assert(out.filter(col("n_types") > col("n_tokens")).count() === 0L)
  }

  test("partition-order-free: 13-partition shuffle reproduces the 1-partition result") {
    val docs = Tables.load(spark, sf, "documents")
    val a = MixStats.q79SourceDivergence(docs.repartition(13)).collect().toSeq
    val b = MixStats.q79SourceDivergence(docs.coalesce(1)).collect().toSeq
    assert(a === b, "pico-bit integer accounting must be partition-order invariant")
  }

  test("q80: a cloned source pairs at jaccard 1.0 with its original; bounds hold") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    // clone src0's docs verbatim under a new source name: identical
    // shingle set -> jaccard exactly 1.0 against src0
    val clone = docs.filter(col("source") === "src0")
      .select((col("doc_id") + 700000).as("doc_id"), col("text"),
        lit("srcclone").as("source"))
    val out = MixStats.q80SourceJaccard(docs.unionByName(clone)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    out.values.foreach { case (n, j) =>
      assert(n > 0L && j > 0.0 && j <= 1.0)
    }
    val (_, jClone) = out(("src0", "srcclone"))
    assert(jClone === 1.0, "identical shingle sets must score exactly 1.0")
    // ordering contract: every pair appears once, lexicographically
    out.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("q80 n_common reconciles with a direct distinct-shingle intersection") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val out = MixStats.q80SourceJaccard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val srcSh = TextOps.shingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), col("s")).distinct()
      .as[(String, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val sources = srcSh.keys.toSeq.sorted
    for (a <- sources; b <- sources if a < b) {
      val expected = (srcSh(a) & srcSh(b)).size.toLong
      assert(out.getOrElse((a, b), 0L) === expected, s"($a, $b)")
    }
  }

  test("q85 rows are exactly the q75-changed buckets; after dominates before") {
    val docs = Tables.load(spark, sf, "documents")
    val drift = MixStats.q85SnapshotDrift(docs).collect()
    val changed = Provenance.q75ManifestDiff(docs).select("bucket").collect()
      .map(_.getLong(0)).toSet
    assert(drift.map(_.getLong(0)).toSet === changed,
      "drift rows must cover exactly the manifest-diff buckets")
    drift.foreach { r =>
      val (nb, na, tb, ta, js) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(na >= nb && ta >= tb, s"bucket ${r.getLong(0)}: after ⊉ before")
      assert(na > nb, s"bucket ${r.getLong(0)} changed but gained no docs " +
        "(ingest-tick snapshots can only grow)")
      assert(js >= 0.0 && js <= 1.0, s"JS out of range: $js")
      assert(js < 0.5, s"bucket ${r.getLong(0)}: a grown bucket sharing its " +
        s"before-content should sit well below the disjoint bound (got $js)")
    }
  }

  test("q85 on a tick-free corpus (before == after) reports zero drift rows") {
    val docs = Tables.load(spark, sf, "documents")
      .filter(pmod(col("doc_id"), lit(Provenance.BatchMod)) =!= 0)
    assert(MixStats.q85SnapshotDrift(docs).count() === 0L,
      "identical snapshots must produce an empty drift report")
  }

  test("q127 mixture rebalance: both branches reachable; the keep branch degenerates to the bootstrap-mix q97 table") {
    // sf0.01 — the q106 tick-1 chain needs the multi-tick partner
    // structure (the IngestLoopSpec argument)
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")

    // default trigger: the planted tick-1 admission skew trips rebalance
    val rb = Provenance.q127MixtureRebalance(docs).collect()
    assert(rb.nonEmpty)
    assert(rb.forall(_.getString(4) == "rebalance"),
      "the default trigger must trip on the planted drift")

    // an unreachable trigger keeps the bootstrap mixture; its
    // weight/rate columns must equal the q97 temperature table over
    // the corpus counts exactly (the maintained mixture degenerates to
    // the bootstrap one — the q113 'no-retrain ≡ q106' discipline)
    val keep = Provenance.q127MixtureRebalance(docs,
      maxDriftMicros = 1000000L).collect()
    assert(keep.forall(_.getString(4) == "keep"),
      "an unreachable trigger must keep the bootstrap mixture")
    val corpus = docs.filter(
      pmod(col("doc_id"), lit(Provenance.BatchMod)).between(1, 9))
    val q97 = graft.operators.Curate.q97TemperatureMix(corpus).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    keep.foreach { r =>
      val (w97, r97) = q97(r.getString(0))
      assert(r.getDouble(5) === w97 && r.getDouble(6) === r97,
        s"keep-branch mixture must equal the bootstrap q97 table for ${r.getString(0)}")
    }

    // the consequence differs between branches: the gate the next tick
    // samples under changed (at this sf the 1–2 docs per source don't
    // flip an admission — the realized n_sampled flip is the gen-sf1
    // rehearsal's pin; here the policy itself must move)
    val rateRb = rb.map(r => r.getString(0) -> r.getDouble(6)).toMap
    val rateKeep = keep.map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(rateRb != rateKeep,
      "rebalancing must change the rate table the next tick samples under")
  }

  test("plan: corpus counts equi-join on the word hash; only the scalar N nested-loops") {
    val df = MixStats.q79SourceDivergence(Tables.load(spark, sf, "documents"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    val wordJoin = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[wh#\\d+L?\\]".r
    assert(wordJoin.findFirstIn(p).isDefined, "no wh equi-join found:\n" + p)
    p.split("\n").filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.trim.matches(".*BroadcastNestedLoopJoin Build(Left|Right), (Inner|Cross)$"),
        "a conditioned BNLJ appeared in the JS plan:\n" + p)
    }
  }
}
