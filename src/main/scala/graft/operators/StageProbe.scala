package graft.operators

import graft.GraftSession
import graft.io.Tables
import org.apache.spark.sql.DataFrame

/** Per-stage timing probe for the curation family (q84/q91/q95/q105) —
  * a [[StageStore]] that times every marker materialization, so the
  * optimization work knows WHICH stage of the labeled frame carries the
  * cost (the bench only sees the query total). Evidence tool, not a
  * query path.
  *
  * Usage: runMain graft.operators.StageProbe <sfDir> [q84|q91|q95]
  */
object StageProbe {
  final class TimingStore extends StageStore {
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    override def materialize(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = LocalStageStore.materialize(name, df)
      times(name) = (System.nanoTime() - t0) / 1e9
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "q91"
    val spark = GraftSession.local(appName = "graft-stageprobe")
    val docs = Tables.load(spark, sfDir, "documents")
    val embs = Tables.load(spark, sfDir, "embeddings")
    def run(tag: String): Unit = {
      val store = new TimingStore
      val t0 = System.nanoTime()
      val df = which match {
        case "q84" => CurateV2.q84CurationPipeline(docs, embs, store = store)
        case "q95" => CurateV2.q95CurationV4(docs, embs, store = store)
        case _     => CurateV2.q91CurationV3(docs, embs, store = store)
      }
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val stages = store.times.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"[probe:$tag] $which total=$total%.2f | $stages")
    }
    run("warm") // JIT + model memos train here
    run("run1"); run("run2")
    spark.stop()
  }
}
