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
  * sum: no step is single-partition, so the rank table scales with
  * executors even when the column is near-unique (l_extendedprice:
  * ~N distinct values).
  *
  * The two-level prefix sum:
  *   1. split the value domain into `Buckets` order-preserving ranges
  *      (cut points from one `approxQuantile` sketch — boundaries only
  *      partition the work, they never affect the prefix sum's
  *      exactness, so the sketch is run at loose 1% accuracy);
  *   2. per-bucket running sum via a window PARTITIONED by bucket
  *      (each partition holds ~distinct/Buckets values — bounded);
  *   3. cross-bucket offsets = exclusive prefix over per-bucket row
  *      totals — `Buckets` numbers, computed on the driver (a
  *      documented scalar barrier, like the quantile barriers in
  *      CleanHistorical) and folded back in as a when-ladder of
  *      literals, so the hot path stays in whole-stage codegen.
  */
object RankStats {

  val Buckets = 32

  /** Order-preserving bucket id: #cuts strictly below v. Monotone in v,
    * ties share a bucket; null → bucket 0 (sorts first, as in a global
    * orderBy). Codegen'd indicator sum — no join, no udf. Shared with
    * [[Packing]]'s token-offset prefix sum. */
  private[operators] def bucketOf(v: Column, cuts: Array[Double]): Column =
    cuts.map(cut => when(v > lit(cut), 1).otherwise(0))
      .foldLeft(lit(0): Column)(_ + _)

  /** Exclusive prefix offsets from per-bucket row totals. */
  private def exclusivePrefix(totals: Map[Int, Long], nBuckets: Int): Map[Int, Long] = {
    var acc = 0L
    (0 until nBuckets).map { b =>
      val off = b -> acc; acc += totals.getOrElse(b, 0L); off
    }.toMap
  }

  /** (value, avg_rank) table for column c given precomputed bucket cut
    * points and cross-bucket offsets — the barrier-free part of the
    * prefix sum (steps 2–3's plan side). */
  private def ranksFrom(df: DataFrame, c: String, cuts: Array[Double],
                        offsets: Map[Int, Long]): DataFrame = {
    val offsetCol = offsets.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (b, off)) => when(col("b") === b, lit(off)).otherwise(acc)
    }
    val wIn = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
      .withColumn("b", bucketOf(col("v"), cuts))
      .withColumn("cum", sum("n").over(wIn) + offsetCol)
      .select(col("v"), (col("cum") - (col("n") - lit(1)) / 2.0).as("r"))
  }

  /** Cut points + per-bucket totals + offsets for a set of columns,
    * sharing the barrier jobs: ONE multi-column approxQuantile sketch
    * and ONE wide indicator aggregate — per column, `Buckets` partial
    * `sum(bucket = b)` counters, all in a single scan with map-side
    * combine (k·Buckets scalars to the driver, no shuffle of cells).
    * Unlike a joint groupBy over bucket-id tuples, this stays O(k·32)
    * for ANY number of columns — the profiler's full Spearman matrix
    * shares it across every numeric column. */
  private def prefixPlan(df: DataFrame, cols: Seq[String])
      : Map[String, (Array[Double], Map[Int, Long])] = {
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val allCuts = df.stat.approxQuantile(cols.toArray, probs, 0.01)
      .map(_.distinct.sorted)
    val aggs = cols.zip(allCuts).flatMap { case (c, cuts) =>
      val b = bucketOf(col(c), cuts)
      (0 to cuts.length).map(i => sum((b === i).cast("long")).as(s"$c!$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zip(allCuts).map { case (c, cuts) =>
      val totals = (0 to cuts.length).map { i =>
        val fi = row.fieldIndex(s"$c!$i")
        i -> (if (row.isNullAt(fi)) 0L else row.getLong(fi))
      }.toMap
      c -> (cuts, exclusivePrefix(totals, cuts.length + 1))
    }.toMap
  }

  /** (value, avg_rank) tables for several columns, SHARING the two
    * barrier jobs (one sketch, one totals scan) across all of them.
    * Ties get the average rank of their run, matching
    * `pandas.rank(method="average")` — the Spearman convention. */
  def rankTables(df: DataFrame, cols: Seq[String]): Map[String, DataFrame] = {
    val plan = prefixPlan(df, cols)
    cols.map { c =>
      val (cuts, offsets) = plan(c)
      c -> ranksFrom(df, c, cuts, offsets)
    }.toMap
  }

  /** (value, avg_rank) table for one numeric column via the grouped
    * CDF. */
  def avgRanks(df: DataFrame, c: String): DataFrame =
    rankTables(df, Seq(c))(c)

  /** q38: Spearman rank correlation of quantity vs extended price.
    * Exercises both rank-join regimes: l_quantity's 50-value rank table
    * broadcasts; l_extendedprice's ~N-value table shuffle-joins. Both
    * columns' prefix-sum barriers share one sketch job and one totals
    * job ([[prefixPlan]]). */
  def q38Spearman(lineitem: DataFrame): DataFrame = {
    val plan = prefixPlan(lineitem, Seq("l_quantity", "l_extendedprice"))
    val (qCuts, qOff) = plan("l_quantity")
    val (pCuts, pOff) = plan("l_extendedprice")
    val rq = ranksFrom(lineitem, "l_quantity", qCuts, qOff)
      .withColumnsRenamed(Map("v" -> "qv", "r" -> "qr"))
    val rp = ranksFrom(lineitem, "l_extendedprice", pCuts, pOff)
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
