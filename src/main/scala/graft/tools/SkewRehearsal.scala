package graft.tools

import graft.GraftSession
import graft.io.Tables
import graft.operators.Skew
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf-skew rehearsal (r4 backlog item 7): measured evidence that the
  * engine's skew posture holds under a REAL hot key, not just uniform
  * synthetic data.
  *
  * Run against a `GenData <sf> <dir> zipf` directory, where l_orderkey
  * is log-uniform (Zipf s≈1): key 0 alone carries ~4.9 % of all
  * lineitem rows. Measures, median-of-3 with warmup, into the noop sink:
  *
  *  - `agg_naive`   — groupBy(l_orderkey) sum/count. Expected to stay
  *    healthy even under skew: partial hash aggregation combines the
  *    hot key map-side, so the final exchange moves one row per
  *    (partition, key). The rehearsal DOCUMENTS this — aggregation
  *    skew is a problem for non-combinable aggregates, not for
  *    decomposable sums.
  *  - `agg_salted`  — the same via [[Skew.saltedSumCount]] (q55's
  *    two-phase machinery, here keyed by the hot column).
  *  - `join_aqe_on` / `join_aqe_off` — lineitem ⋈ orders on the skewed
  *    key (sort-merge at this size), with AQE's OptimizeSkewedJoin
  *    allowed vs disabled; `skew_join_fired` reports whether the final
  *    adaptive plan actually marked the join skew=true, i.e. the
  *    100 TB claim "AQE splits the straggler partition" observed on
  *    real data rather than asserted.
  *
  * Usage: runMain graft.tools.SkewRehearsal <zipfDir> [outJson]
  */
object SkewRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = if (args.length > 1) args(1) else "bench_history/r7_zipf.json"
    val spark = GraftSession.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-skew-rehearsal")

    val lineitem = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")

    val hot = lineitem.groupBy("l_orderkey").count()
      .orderBy(desc("count")).limit(1).collect()(0)
    val nRows = lineitem.count()

    def aggNaive = lineitem.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    def aggSalted = Skew.saltedSumCount(
      lineitem, Seq("l_orderkey"), col("l_quantity"), "qty")
    def joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))

    def run(df: => DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med3(df: => DataFrame): Double = {
      run(df) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    val tNaive = med3(aggNaive)
    val tSalted = med3(aggSalted)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tJoinOff = med3(joined)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val tJoinOn = med3(joined)
    // inspect the FINAL adaptive plan of an executed instance
    val exec = joined
    run(exec)
    val skewFired = exec.queryExecution.executedPlan.toString.contains("skew=true")

    val json =
      s"""{"dir":"$dir","rows":$nRows,"hot_key":${hot.getLong(0)},"hot_key_rows":${hot.getLong(1)},
         |"agg_naive_sec":$tNaive,"agg_salted_sec":$tSalted,
         |"join_aqe_off_sec":$tJoinOff,"join_aqe_on_sec":$tJoinOn,
         |"skew_join_fired":$skewFired}""".stripMargin.replace("\n", "")
    println(json)
    val pw = new java.io.PrintWriter(out)
    try pw.println(json) finally pw.close()
    spark.stop()
  }
}
