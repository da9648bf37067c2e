package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query harness diagnostics the bench line cannot show: wall
  * seconds, SPARK JOB COUNT, stage count, task count, and total shuffle
  * bytes (read + written) for ONE execution of each named query into
  * the noop sink. Job count is the overhead multiplier at any scale
  * (each job = a driver barrier: scheduling + result collection);
  * shuffle bytes are the §2 cost that grows with data.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <query>|ALL ...
  * Output: one `{"query":...,"secs":...,"jobs":...,"stages":...,
  * "tasks":...,"shuffleMB":...}` line per query (after one untimed
  * warmup of that query so JIT/codegen does not ride the numbers).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <sfDir> <query>|ALL ...")
    val sfDir = args(0)
    val names =
      if (args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus = cpus, shufflePartitions = cpus,
      appName = "graft-queryprofile")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        val m = e.stageInfo.taskMetrics
        if (m != null) shuffleBytes.addAndGet(
          m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      try {
        runOnce(name) // warmup (JIT + codegen + parquet footers)
        Thread.sleep(50) // let straggling listener events drain
        jobs.set(0); stages.set(0); tasks.set(0); shuffleBytes.set(0)
        val t0 = System.nanoTime()
        runOnce(name)
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        println(f"""{"query":"$name","secs":$secs%.3f,"jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},"shuffleMB":${shuffleBytes.get / 1e6}%.2f}""")
      } catch { case e: Throwable =>
        println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
