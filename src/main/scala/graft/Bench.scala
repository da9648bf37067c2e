package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query steady-state seconds on
  * SPARK_GRAFT_SF_DIR (driver contract).
  *
  * Measurement notes:
  *  - Queries execute into the `noop` sink: full computation of every
  *    output column is forced (a `count()` would let column pruning
  *    delete the projections under measurement), nothing is written.
  *  - One untimed warmup run per query first (JIT + parquet footer +
  *    codegen compilation), then best-of-two timed runs — the driver
  *    compares engines on steady-state throughput, and the min of two
  *    absorbs this box's scheduling noise without masking real cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false") // engine-canonical (GraftSession)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t = try {
        run(fn) // warmup
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          run(fn)
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
