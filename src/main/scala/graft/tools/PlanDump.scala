package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` physical plans for named SparkEntry
  * queries, in the canonical session (extensions ON), as the markdown
  * sections committed to PLANS_r{N}.md. Plans — not timings — are the
  * evidence the scale review reads: exchanges, broadcast choices,
  * codegen spans, pushed filters.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <query> [query ...]
  *        runMain graft.tools.PlanDump <sfDir> ALL
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query>|ALL ...")
    val sfDir = args(0)
    val names =
      if (args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val spark = GraftSession.local(appName = "graft-plandump")
    try names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"\n## $n\n")
      println("```")
      println(df.queryExecution.explainString(FormattedMode).trim)
      println("```")
    } finally spark.stop()
  }
}
