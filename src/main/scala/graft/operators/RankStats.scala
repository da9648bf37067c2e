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
  * partition): the rank of value v is derived from the grouped CDF —
  * count per distinct value, cumulative sum over the distinct-value
  * table, average tie rank `cum - (n-1)/2` — joined back to rows by
  * value. The cumulative sum itself is a DISTRIBUTED two-level prefix
  * sum (see [[avgRanks]]): no step is single-partition, so the rank
  * table scales with executors even when the column is near-unique
  * (l_extendedprice: ~N distinct values).
  */
object RankStats {

  /** (value, avg_rank) table for one numeric column via the grouped
    * CDF. Ties get the average rank of their run, matching
    * `pandas.rank(method="average")` — the Spearman convention.
    *
    * Distributed prefix sum, two levels:
    *   1. split the value domain into `buckets` order-preserving ranges
    *      (cut points from one `approxQuantile` pass — the boundaries
    *      only need to be order-consistent, not exact, for the prefix
    *      sum to be exact);
    *   2. per-bucket running sum via a window PARTITIONED by bucket
    *      (each partition holds ~distinct/buckets values — bounded);
    *   3. cross-bucket offsets = exclusive prefix over the per-bucket
    *      row totals — `buckets` numbers, computed on the driver (a
    *      documented scalar barrier, like the quantile barriers in
    *      CleanHistorical) and folded back in as a when-ladder of
    *      literals, so the hot path stays in whole-stage codegen.
    *
    * The per-bucket totals come straight from the raw rows
    * (`groupBy(bucket).count` — map-side partial agg to ≤`buckets`
    * rows), not from the rank table, so nothing is computed twice. */
  def avgRanks(df: DataFrame, c: String, buckets: Int = 32): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = df.stat.approxQuantile(c, probs, 0.001).distinct.sorted
    // Order-preserving bucket id: #cuts strictly below v. Monotone in v,
    // ties share a bucket; null → bucket 0 (sorts first, as in a global
    // orderBy). Codegen'd indicator sum — no join, no udf.
    def bucketOf(v: Column): Column =
      cuts.map(cut => when(v > lit(cut), 1).otherwise(0))
        .foldLeft(lit(0): Column)(_ + _)

    val totals = df.groupBy(bucketOf(col(c)).as("b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Exclusive prefix: rows in all buckets strictly below b.
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to cuts.length).map { b =>
        val off = b -> acc; acc += totals.getOrElse(b, 0L); off
      }.toMap
    }
    val offsetCol = offsets.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (b, off)) => when(col("b") === b, lit(off)).otherwise(acc)
    }

    val wIn = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
      .withColumn("b", bucketOf(col("v")))
      .withColumn("cum", sum("n").over(wIn) + offsetCol)
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
