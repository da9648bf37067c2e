package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second relational batch: multi-level aggregation and join variants
  * beyond the reference's surface (engine completeness; the reference
  * has no joins or grouping sets at all, SURVEY §2.4).
  */
object Relational2 {

  /** q65: robust per-group outlier census via MAD (median absolute
    * deviation) — the ydata/robust-statistics complement to q07's IQR
    * fences: median and MAD are 50%-breakdown estimators, so the fence
    * itself cannot be dragged by the outliers it is hunting (stddev
    * z-scores can). Two grouped exact-percentile passes (median, then
    * median of absolute deviations) with the 5-row per-group scalars
    * broadcast back — the grouped generalization of the clean-path's
    * scalar quantile barriers; at 100 TB each percentile runs per
    * group, not globally, and `ApproxAboveThreshold` applies. 1.4826
    * scales MAD to σ-equivalent under normality (the standard
    * consistency constant). */
  def q65MadOutliers(orders: DataFrame, k: Double = 1.2): DataFrame = {
    val med = orders.groupBy("o_orderpriority")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("m"))
    val mad = orders.join(broadcast(med), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(max("m").as("m"),
           percentile(abs(col("o_totalprice") - col("m")), lit(0.5)).as("mad"))
    orders.join(broadcast(mad), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(
        round(max("m"), 4).as("median_price"),
        round(max("mad"), 4).as("mad"),
        sum((abs(col("o_totalprice") - col("m")) > lit(k) * 1.4826 * col("mad"))
          .cast("long")).as("n_outliers"))
      .orderBy("o_orderpriority")
  }

  def q65Sql(k: Double = 1.2): String =
    s"""WITH med AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS m
       |             FROM orders GROUP BY 1),
       |mad AS (SELECT o.o_orderpriority, max(m) AS m,
       |          quantile_cont(abs(o_totalprice - m), 0.5) AS mad
       |        FROM orders o JOIN med USING (o_orderpriority) GROUP BY 1)
       |SELECT o.o_orderpriority, round(max(mad.m), 4) AS median_price,
       |  round(max(mad.mad), 4) AS mad,
       |  cast(sum(CASE WHEN abs(o_totalprice - mad.m) > $k * 1.4826 * mad.mad
       |                THEN 1 ELSE 0 END) AS bigint) AS n_outliers
       |FROM orders o JOIN mad USING (o_orderpriority)
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q31: ROLLUP — hierarchical totals in one pass (partial aggregation
    * handles all grouping sets in a single shuffle). Null grouping keys
    * from the rollup are replaced with sentinels so the oracle compares
    * on identical values (Spark and DuckDB agree on ROLLUP null
    * semantics, but sentinels make sort order unambiguous too). */
  def q31Rollup(orders: DataFrame): DataFrame =
    orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("status", "priority")

  def q31Sql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |  coalesce(o_orderpriority, 'ALL') AS priority,
       |  count(*) AS n, ${sumdSql("o_totalprice")} AS sum_price
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  /** q32: anti join — orders with no lineitems (left_anti is the
    * shuffle-light way to express NOT EXISTS; the probe side is
    * pre-aggregated to distinct keys before the join). */
  def q32AntiJoin(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")

  def q32Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q33: semi join + set op — customers that placed BOTH a fulfilled
    * and an open order (INTERSECT of key sets; Spark plans both sides
    * as semi-join aggregates). */
  def q33SemiIntersect(orders: DataFrame): DataFrame = {
    val f = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
    val o = orders.filter(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(o).withColumnRenamed("o_custkey", "custkey").orderBy("custkey")
  }

  def q33Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY custkey""".stripMargin
}
