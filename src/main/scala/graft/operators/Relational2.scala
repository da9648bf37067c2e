package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second relational batch: multi-level aggregation and join variants
  * beyond the reference's surface (engine completeness; the reference
  * has no joins or grouping sets at all, SURVEY §2.4).
  */
object Relational2 {

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
