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
