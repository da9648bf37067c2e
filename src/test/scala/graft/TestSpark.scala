package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark session startup is
  * the dominant test cost; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cpus = 4,
    shufflePartitions = 4, appName = "graft-test")
}
