package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Partition-pruned layout (the q51 split materialization path): writing
  * a corpus `partitionBy(split)` means a train-only consumer reads NONE
  * of the val/test bytes — the scan must show a PartitionFilters entry
  * and list only the matching directory. This is the storage-layout
  * half of the pushdown contract (PlanShapeSpec pins the data-filter
  * half).
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitionBy(split) write prunes non-matching partitions at read") {
    val docs = Tables.load(spark, sf, "documents")
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 10
    val withSplit = docs.withColumn("split",
      when(h === 0, lit("test")).when(h === 1, lit("val")).otherwise(lit("train")))
    val out = Files.createTempDirectory("graft-split").toString
    withSplit.write.mode("overwrite").partitionBy("split").parquet(out)

    val train = spark.read.parquet(out).filter(col("split") === "train")
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"),
      "split filter must prune partitions, not scan rows:\n" + plan)
    // counts agree with the in-memory assignment, and val/test read nothing
    val want = withSplit.filter(col("split") === "train").count()
    assert(train.count() === want)
    // the pruned scan's file listing excludes other split directories
    val scanned = train.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("split=val") && !scanned.contains("split=test"),
      scanned)
  }
}
