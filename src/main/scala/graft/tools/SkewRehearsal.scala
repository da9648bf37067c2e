package graft.tools

import graft.GraftSession
import graft.SparkEntry
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
  * lineitem rows. Everything is median-of-3 with an untimed warmup,
  * into the noop sink. Three skew mechanisms, measured separately:
  *
  * 1. DECOMPOSABLE AGGREGATION — `agg_naive` (groupBy sum/count, both
  *    by the 3-key l_returnflag = q55's shape and by the zipf-hot
  *    l_orderkey) vs `agg_salted` ([[Skew.saltedSumCount]]). Expected
  *    and measured: NAIVE IS ALREADY SKEW-IMMUNE — partial hash
  *    aggregation combines the hot key map-side, so the final exchange
  *    moves one row per (map partition, key) regardless of skew. The
  *    rehearsal pins that parity (salting = physical insurance with
  *    bounded overhead, not a win for sums); skew in aggregation is a
  *    problem only for non-decomposable state, which is case 2.
  *
  * 2. NON-DECOMPOSABLE AGGREGATION — `pct_exact` vs `pct_sketch`:
  *    per-orderkey exact `percentile` ships every value of the hot key
  *    to one reducer (the partial state IS the value list — salting
  *    cannot decompose an exact rank statistic), while
  *    `approx_percentile`'s QuantileSummaries sketch is mergeable and
  *    therefore combines map-side like a sum. This is the measured,
  *    skewed-data case for the [[graft.catalyst.ApproxAboveThreshold]]
  *    valve: at 100 TB the valve converts the straggler/OOM shape into
  *    the mergeable shape automatically.
  *
  * 3. JOIN SKEW — lineitem ⋈ orders on the skewed key with broadcast
  *    disabled (at rehearsal scale the orders side would broadcast and
  *    make the join trivially skew-immune — that IS the first-choice
  *    posture, but 100 TB fact-fact joins can't broadcast, so the
  *    rehearsal forces the sort-merge path), at CLUSTER parallelism:
  *    256 shuffle partitions, because skew severity is RELATIVE — a
  *    4.9 % hot key is only ~2× the median of 32 partitions (each
  *    ~3 %) but >12× the median of 256 — one straggler among hundreds
  *    of executor slots is precisely the 1000-executor failure mode.
  *    AQE's byte cutoffs are scaled to local partition sizes (cluster
  *    defaults: 256 MiB threshold / 64 MiB advisory; local zipf
  *    partitions are single-digit MiB — same ratio, smaller box;
  *    `skewedPartitionFactor` stays at its default 5; scan partition
  *    size scaled down the same way, because AQE can only split a
  *    skewed reducer partition at MAP-output boundaries and a 150 MB
  *    local table read by 2 maps models a 2-executor cluster):
  *    `join_aqe_on` vs `join_aqe_off` wall-clock, plus
  *    `skew_join_fired` read off the FINAL adaptive plan — i.e. "AQE
  *    splits the straggler partition" observed on real data rather
  *    than asserted — plus `straggler_task_{off,on}_ms`, the longest
  *    single task of the join each way. On local[32] the wall-clock
  *    delta is noise (there is no idle slot for a split to reclaim),
  *    so the cluster-relevant number is the straggler metric: max task
  *    duration is what 999 other executors wait out at the stage
  *    barrier. Duration still carries co-tenancy noise, so
  *    `max_task_shuffle_read_{off,on}_bytes` rides along — the bytes a
  *    single task must drain is a plan property, and the split shows
  *    up as a hard drop (hot-partition read → advisory-sized read).
  *
  * Also rides along: `q03_zipf_sec` — the star join (q03) over the
  * zipf directory with default confs, pinning that broadcast joins are
  * skew-immune by construction (dimensions broadcast; no skewed
  * exchange exists to split).
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

    // 1. decomposable aggregation: q55 shape (3 hot keys) + zipf key
    def aggNaive = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    def aggSalted = Skew.saltedSumCount(
      lineitem, Seq("l_returnflag"), col("l_quantity"), "qty")
    def aggKeyNaive = lineitem.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    def aggKeySalted = Skew.saltedSumCount(
      lineitem, Seq("l_orderkey"), col("l_quantity"), "qty")

    // 2. non-decomposable state: exact rank statistic vs mergeable
    // sketch, in q07's own shape — few massive groups, so each exact
    // percentile is one reducer holding millions of raw values (the
    // straggler), while the sketch combines map-side across all cores
    def pctExact = lineitem.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    def pctSketch = lineitem.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("med"))

    // 3. forced sort-merge join on the skewed key
    def joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))

    def run(df: => DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(df: => DataFrame): Double = {
      val t0 = System.nanoTime(); run(df); (System.nanoTime() - t0) / 1e9
    }
    // Interleaved median-of-3 over a whole variant list (Bench's
    // protocol): one untimed warmup pass, then 3 timed passes visiting
    // every variant per pass. A co-tenancy burst lands on all variants
    // of one pass instead of on all samples of one variant, so the
    // PAIRWISE comparisons (naive vs salted, exact vs sketch, aqe off
    // vs on) stay meaningful under drift; the median rejects the burst.
    def med3All(variants: Seq[(String, () => Unit)]): Map[String, Double] = {
      variants.foreach(_._2())
      val passes = (1 to 3).map { _ =>
        variants.map { case (name, go) =>
          val t0 = System.nanoTime(); go(); name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      variants.map { case (name, _) =>
        name -> passes.map(_(name)).sorted.apply(1)
      }.toMap
    }

    // SPARK_GRAFT_SKEW_ONLY=join skips the agg/pct phases (dev loop
    // for iterating on the join section without repeating ~6 min)
    val joinOnly = sys.env.get("SPARK_GRAFT_SKEW_ONLY").contains("join")

    // valve threshold untouched for pct: the point is the raw exact-vs-
    // sketch gap on skewed keys, not the rewrite (ValveCheck covers it)
    val phaseA: Map[String, Double] =
      if (joinOnly) Map.empty.withDefaultValue(-1.0)
      else med3All(Seq(
        "agg_naive" -> (() => run(aggNaive)),
        "agg_salted" -> (() => run(aggSalted)),
        "agg_bykey_naive" -> (() => run(aggKeyNaive)),
        "agg_bykey_salted" -> (() => run(aggKeySalted)),
        "pct_exact" -> (() => run(pctExact)),
        "pct_sketch" -> (() => run(pctSketch)),
        "q03" -> (() => run(SparkEntry.queries("q03_star_join")(spark, dir)))))
    val tNaive = phaseA("agg_naive"); val tSalted = phaseA("agg_salted")
    val tKeyNaive = phaseA("agg_bykey_naive")
    val tKeySalted = phaseA("agg_bykey_salted")
    val tPctExact = phaseA("pct_exact"); val tPctSketch = phaseA("pct_sketch")
    val tQ03 = phaseA("q03")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    // scale AQE's skew cutoffs to local partition sizes (cluster
    // defaults: 256 MiB threshold / 64 MiB advisory — local zipf
    // shuffle partitions are ~0.1 MiB compressed; same ~4:1 ratio).
    // The hot partition is ~3.4 MiB vs a ~0.12 MiB median (28×), so
    // the default skewedPartitionFactor=5 is what actually detects it.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    // AQE splits a skewed reducer partition at MAP-output boundaries;
    // the default 128 MiB scan partitioning reads this whole table in
    // 2 maps, which models a 2-executor cluster, not a 1000-executor
    // one. Scale map granularity with the box the same way the skew
    // cutoffs are scaled, so the splitter has real map ranges to cut.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)

    // interleaved off/on pairs: the conf flips around each measurement
    def withAqe[A](on: Boolean)(body: => A): A = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString); body
    }
    val phaseB = med3All(Seq(
      "join_aqe_off" -> (() => withAqe(on = false)(run(joined))),
      "join_aqe_on" -> (() => withAqe(on = true)(run(joined)))))
    val tJoinOff = phaseB("join_aqe_off")
    val tJoinOn = phaseB("join_aqe_on")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // Straggler metric: LONGEST SINGLE TASK in the join, off vs on.
    // local[32] wall-clock can't reward a skew split (no idle slot
    // exists to reclaim — every core is busy either way, and the split
    // adds scheduling work), but max task duration is exactly what a
    // cluster straggler costs: 999 executors idling at a stage barrier
    // while one slot drains the hot partition. The split's win IS the
    // max-task reduction.
    // Max SHUFFLE-READ BYTES per task is the deterministic companion:
    // wall-clock and task durations carry co-tenancy noise, but the
    // byte count any single task must drain is a property of the plan.
    // Off: one task reads the whole hot partition; on: the skew split
    // caps every task's read near the advisory size.
    class MaxTask extends org.apache.spark.scheduler.SparkListener {
      @volatile var maxMs: Long = 0L
      @volatile var maxBytes: Long = 0L
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && m.shuffleReadMetrics != null) {
          val b = m.shuffleReadMetrics.totalBytesRead
          if (b > maxBytes) maxBytes = b
          if (b > 0 && e.taskInfo.duration > maxMs) maxMs = e.taskInfo.duration
        }
      }
    }
    def maxTask(on: Boolean): (Long, Long) = {
      val l = new MaxTask
      spark.sparkContext.addSparkListener(l)
      try { withAqe(on)(run(joined)); Thread.sleep(1000) } // listener drain
      finally spark.sparkContext.removeSparkListener(l)
      (l.maxMs, l.maxBytes)
    }
    val (stragglerOff, bytesOff) = maxTask(on = false)
    val (stragglerOn, bytesOn) = maxTask(on = true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // inspect the FINAL adaptive plan of an executed instance. Must
    // execute through THIS DataFrame's own QueryExecution (collect —
    // the result is a 5-row aggregate): df.write constructs a separate
    // internal QueryExecution, so a noop-write would leave this plan
    // un-executed and its adaptive skew markers unset.
    val exec = joined
    exec.collect()
    val skewFired = exec.queryExecution.executedPlan.toString.contains("skew=true")
    if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
      println(exec.queryExecution.executedPlan.toString)

    val json =
      s"""{"dir":"$dir","rows":$nRows,"hot_key":${hot.getLong(0)},"hot_key_rows":${hot.getLong(1)},
         |"agg_naive_sec":$tNaive,"agg_salted_sec":$tSalted,
         |"agg_bykey_naive_sec":$tKeyNaive,"agg_bykey_salted_sec":$tKeySalted,
         |"pct_exact_sec":$tPctExact,"pct_sketch_sec":$tPctSketch,
         |"q03_zipf_sec":$tQ03,
         |"join_aqe_off_sec":$tJoinOff,"join_aqe_on_sec":$tJoinOn,
         |"straggler_task_off_ms":$stragglerOff,"straggler_task_on_ms":$stragglerOn,
         |"max_task_shuffle_read_off_bytes":$bytesOff,"max_task_shuffle_read_on_bytes":$bytesOn,
         |"skew_join_fired":$skewFired}""".stripMargin.replace("\n", "")
    println(json)
    val pw = new java.io.PrintWriter(out)
    try pw.println(json) finally pw.close()
    spark.stop()
  }
}
