package graft.tools

import graft.GraftSession
import graft.SparkEntry
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** Valve-fire evidence for the sf10 rehearsal: for each exact-percentile
  * query, report the optimizer's estimated aggregate input size and
  * whether [[graft.catalyst.ApproxAboveThreshold]] actually rewrote
  * exact `Percentile` to the mergeable sketch on THIS data size —
  * the observable the 100 TB percentile story rests on.
  *
  * Usage: runMain graft.tools.ValveCheck <sfDir> [query ...]
  */
object ValveCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q07_quartiles_outliers", "q08_median_impute",
      "q59_sampled_quantiles", "q65_mad_outliers")
    val spark = GraftSession.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-valve-check")
    // Optional threshold override (bytes): the deployment knob. Lets the
    // rehearsal show the rewrite firing on real data at a size this box
    // can hold, plus the default-threshold reading at the same sf.
    sys.env.get("SPARK_GRAFT_VALVE_THRESHOLD").foreach { t =>
      spark.conf.set(graft.catalyst.ApproxAboveThreshold.ThresholdKey, t)
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.optimizedPlan
      var exact = 0; var approx = 0
      val sizes = scala.collection.mutable.ArrayBuffer.empty[BigInt]
      plan.foreach {
        case agg: Aggregate =>
          var relevant = false
          agg.aggregateExpressions.foreach(_.foreach {
            case AggregateExpression(_: Percentile, _, _, _, _) =>
              exact += 1; relevant = true
            case AggregateExpression(_: ApproximatePercentile, _, _, _, _) =>
              approx += 1; relevant = true
            case _ =>
          })
          if (relevant) sizes += agg.child.stats.sizeInBytes
        case _ =>
      }
      println(s"VALVE $name exactPercentile=$exact approxPercentile=$approx " +
        s"aggInputBytes=${sizes.mkString("/")} " +
        s"fired=${approx > 0 && exact == 0}")
    }
    spark.stop()
  }
}
