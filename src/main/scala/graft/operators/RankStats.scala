package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics: Spearman correlation for the profiling suite
  * (SURVEY A10 — ydata-profiling computes Pearson AND Spearman; q13
  * covers Pearson, this covers Spearman).
  *
  * Spearman = Pearson over average-ranks. Ranks are NOT computed with a
  * global row window (which would funnel every row through one
  * partition): instead the rank of value v is derived from the grouped
  * CDF — count per distinct value, cumulative sum over the (much
  * smaller) distinct-value table, average tie rank
  * `cum - (n-1)/2` — then joined back to rows by value. The only
  * single-partition step is the prefix sum over DISTINCT values
  * (50 rows for l_quantity; bounded by column cardinality, not table
  * size). This is the same trick ydata's big-data mode and SQL engines
  * use for exact ranks at scale.
  */
object RankStats {

  /** (value, avg_rank) table for one numeric column via the grouped
    * CDF. Ties get the average rank of their run, matching
    * `pandas.rank(method="average")` — the Spearman convention. */
  def avgRanks(df: DataFrame, c: String): DataFrame = {
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(w))
      .select(col("v"), (col("cum") - (col("n") - lit(1)) / 2.0).as("r"))
  }

  /** q38: Spearman rank correlation of quantity vs extended price.
    * Exercises both rank-join regimes: l_quantity's 50-value rank table
    * broadcasts; l_extendedprice's ~N-value table shuffle-joins. */
  def q38Spearman(lineitem: DataFrame): DataFrame = {
    val rq = avgRanks(lineitem, "l_quantity")
      .withColumnsRenamed(Map("v" -> "qv", "r" -> "qr"))
    val rp = avgRanks(lineitem, "l_extendedprice")
      .withColumnsRenamed(Map("v" -> "pv", "r" -> "pr"))
    lineitem
      .join(broadcast(rq), col("l_quantity") === col("qv"))
      .join(rp, col("l_extendedprice") === col("pv"))
      .agg(count(lit(1)).as("n"),
           round(corr(col("qr"), col("pr")), 6).as("spearman_qty_price"))
  }

  def q38Sql: String =
    """WITH rq AS (SELECT l_quantity AS v, count(*) AS n FROM lineitem GROUP BY 1),
      |rq2 AS (SELECT v, sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |          AND CURRENT ROW) - (n - 1) / 2.0 AS r FROM rq),
      |rp AS (SELECT l_extendedprice AS v, count(*) AS n FROM lineitem GROUP BY 1),
      |rp2 AS (SELECT v, sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |          AND CURRENT ROW) - (n - 1) / 2.0 AS r FROM rp)
      |SELECT count(*) AS n, round(corr(q.r, p.r), 6) AS spearman_qty_price
      |FROM lineitem l
      |JOIN rq2 q ON l.l_quantity = q.v
      |JOIN rp2 p ON l.l_extendedprice = p.v""".stripMargin
}
