package graft.operators

import graft.TestSpark
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-location (SURVEY "Partitioning & shuffle" posture):
  * pre-bucketing both join sides on the join key removes the per-query
  * shuffle entirely — the 100 TB answer for a join that runs every day
  * on the same key. local[32] can't show a cluster, but the PLAN is the
  * contract: a bucketed join must have ZERO Exchange operators, while
  * the same join on plain parquet shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plans with zero exchanges; plain join shuffles") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    // disable broadcast so the join strategy question is real
    def withoutBroadcast[T](body: => T): T = {
      val k = "spark.sql.autoBroadcastJoinThreshold"
      val old = spark.conf.get(k)
      spark.conf.set(k, "-1")
      try body finally spark.conf.set(k, old)
    }

    val bucketed = withoutBroadcast {
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    assert(!bucketed.contains("Exchange"),
      "bucketed join must not shuffle (co-located buckets):\n" + bucketed)

    val plain = withoutBroadcast {
      val j = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    assert(plain.contains("Exchange"),
      "plain parquet join should shuffle — control assertion:\n" + plain)

    // value sanity: both paths agree
    val a = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .count()
    val b = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
    assert(a === b)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
