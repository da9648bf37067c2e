package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the 100 TB posture for hot keys.
  *
  * A `groupBy(key).agg(...)` with one dominant key sends that key's
  * entire input to a single reducer. AQE's skew handling only splits
  * *join* partitions; for aggregation the classic fix is salting:
  *
  *   phase 1: groupBy(key, salt = pmod(hash-ish, S)) — S-way spread of
  *            the hot key, partial results per (key, salt);
  *   phase 2: groupBy(key) over the S partials — at most S rows per
  *            key, trivially balanced.
  *
  * Only aggregates with a decomposition (sum/count/min/max — and avg
  * as sum+count) can be salted this way; that is why the helper takes
  * the decomposed form explicitly instead of arbitrary aggs.
  */
object Skew {

  /** Salted two-phase sum/count per key: returns (key..., sum_<col>,
    * cnt). `salt` buckets spread each key's rows; correctness is
    * independent of S (pinned by SkewSpec against the direct groupBy). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                     valueName: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueName"),
           sum(col("_pcnt")).as("cnt"))
  }

  /** q55: the salted aggregation as a first-class query — sum/count of
    * quantity per return flag, a 3-key aggregation where every key is a
    * hot key (the exact shape AQE does NOT fix: its skew handling only
    * splits join partitions). Result is identical to the direct
    * groupBy — the salt is pure physical spreading — so the oracle is
    * the plain GROUP BY. Decimal-exact sum for cross-engine identity. */
  def q55SaltedAgg(lineitem: DataFrame): DataFrame =
    saltedSumCount(lineitem, Seq("l_returnflag"),
        graft.functions.Exact.dec4(col("l_quantity")), "qty")
      .select(col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"), col("cnt"))
      .orderBy("l_returnflag")

  def q55Sql: String =
    s"""SELECT l_returnflag, ${graft.functions.Exact.sumdSql("l_quantity")} AS sum_qty,
       |  count(*) AS cnt
       |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin
}
