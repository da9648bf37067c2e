package graft.operators

import graft.TestSpark
import graft.functions.Exact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation: identical results to the direct groupBy on a
  * deliberately skewed input (90% of rows on one key), for any salt
  * bucket count. Values go through exact decimal so the comparison is
  * order-independent. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val skewed = {
    import spark.implicits._
    (1 to 100000).map { i =>
      val key = if (i % 10 != 0) "hot" else s"key${i % 97}"
      (key, (i % 1000) / 100.0)
    }.toDF("k", "v")
  }

  test("salted two-phase sum/count equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum(Exact.dec4(col("v"))).as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    for (buckets <- Seq(1, 4, 32)) {
      val salted = Skew.saltedSumCount(skewed, Seq("k"), Exact.dec4(col("v")),
          "v", buckets)
        .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
      assert(salted.keySet === direct.keySet, s"buckets=$buckets")
      direct.foreach { case (k, (s, c)) =>
        assert(salted(k)._1.compareTo(s) === 0, s"buckets=$buckets key=$k sum")
        assert(salted(k)._2 === c, s"buckets=$buckets key=$k count")
      }
    }
  }

  test("phase-1 spreads the hot key across salt buckets") {
    val salted = skewed.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
    val hotBuckets = salted.filter(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(hotBuckets > 8, s"hot key only landed in $hotBuckets buckets")
  }
}
