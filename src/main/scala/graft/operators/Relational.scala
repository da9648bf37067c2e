package graft.operators

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator suite over the synthetic star schema (TESTDATA.md).
  *
  * Re-expresses the reference's aggregation/projection/filter surface
  * (SURVEY.md §2.2–2.3) — plus the joins/windows/top-k a complete engine
  * needs — as declarative DataFrame plans. Every query is deterministic
  * across engines (exact decimal sums, rounded interpolated stats,
  * explicit total orders) so the driver's DuckDB oracle hash-matches.
  *
  * Scale notes per query are in each scaladoc; the common posture:
  * group-by aggregates are partial-aggregated map-side (decimal sums are
  * associative), joins broadcast dimension tables, sorts that feed a
  * limit become TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  /** Pricing summary (TPC-H Q1 shape; reference A1–A3 analogues).
    * Map-side partial aggregation on 6 grouped columns; one shuffle on
    * (l_returnflag, l_linestatus) — 6 groups, trivially skew-free. */
  def q01PricingSummary(lineitem: DataFrame): DataFrame = {
    val price = dec4(col("l_extendedprice"))
    val discFactor = lit(1).cast(DecimalType(6, 4)) - dec4(col("l_discount")).cast(DecimalType(6, 4))
    val taxFactor = lit(1).cast(DecimalType(6, 4)) + dec4(col("l_tax")).cast(DecimalType(6, 4))
    lineitem
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        // Products of 2-decimal factors carry ≤6 decimal digits, so the
        // scale-6 cast is exact — rounding here would NOT be portable
        // (Spark casts HALF_UP; DuckDB resolves halves differently).
        // Final conversion via d2d: a scale-6 sum's unscaled value
        // crosses 2^53 at sf1, where native decimal→double casts diverge.
        d2d(sum((price * discFactor).cast(DecimalType(18, 6)))).as("sum_disc_price"),
        d2d(sum((price * discFactor * taxFactor).cast(DecimalType(18, 6)))).as("sum_charge"),
        avgd(col("l_quantity")).as("avg_qty"),
        avgd(col("l_extendedprice")).as("avg_price"),
        avgd(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sumdSql("l_quantity")} AS sum_qty,
       |  ${sumdSql("l_extendedprice")} AS sum_base_price,
       |  ${d2dSql("sum(cast(cast(l_extendedprice AS decimal(18,4)) * (1 - cast(l_discount AS decimal(6,4))) AS decimal(18,6)))")} AS sum_disc_price,
       |  ${d2dSql("sum(cast(cast(l_extendedprice AS decimal(18,4)) * (1 - cast(l_discount AS decimal(6,4))) * (1 + cast(l_tax AS decimal(6,4))) AS decimal(18,6)))")} AS sum_charge,
       |  ${avgdSql("l_quantity")} AS avg_qty,
       |  ${avgdSql("l_extendedprice")} AS avg_price,
       |  ${avgdSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Top-k: sort+limit compiles to TakeOrderedAndProject — per-partition
    * heaps + driver merge, no global sort shuffle. The reference's one
    * "sort" is exactly this shape (source-pushed top-100, SURVEY §2.4). */
  def q02TopkOrders(orders: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_date"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  def q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, cast(o_orderdate AS date) AS o_date
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Star join: fact⋈dims with explicit broadcast of the small sides.
    * At 100 TB the orders⋈customer join shuffles on the key unless
    * customer is broadcastable; nation/region always broadcast. */
  def q03StarJoin(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                  region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "c_mktsegment")
      .agg(sumd(col("o_totalprice")).as("sum_sales"),
           count(lit(1)).as("n_orders"))
      .orderBy("r_name", "c_mktsegment")

  def q03Sql: String =
    s"""SELECT r_name, c_mktsegment, ${sumdSql("o_totalprice")} AS sum_sales,
       |  count(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, c_mktsegment
       |ORDER BY r_name, c_mktsegment""".stripMargin

  /** Filter+project with predicates that push to the parquet scan
    * (PushedFilters on l_shipdate/l_discount/l_quantity) and column
    * pruning to a 4-column ReadSchema. */
  def q04FilterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate").between(
        lit("1998-01-01").cast("timestamp_ntz"),
        lit("1998-12-31").cast("timestamp_ntz")))
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  def q04Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31'
      |  AND l_discount > 0.05 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Grouped describe (reference A5/A6): count/mean/min/max/median/std
    * per group. Exact percentile is the scale watch item (SURVEY §7.4.1);
    * at 100 TB flip to approx_percentile. */
  def q06GroupDescribe(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        avgd(col("o_totalprice")).as("mean_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("median_price"),
        round(stddev_samp(col("o_totalprice")), 4).as("std_price"))
      .orderBy("o_orderpriority")

  def q06Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n,
       |  ${avgdSql("o_totalprice")} AS mean_price,
       |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       |  round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       |  round(stddev_samp(o_totalprice), 4) AS std_price
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** IQR outlier profile (reference A1+O9 semantics on testdata):
    * quartiles → 1.5·IQR bounds → outlier count. Two-pass with a scalar
    * barrier, exactly the reference dataflow (SURVEY §3.2). Quartiles of
    * 2-decimal data are quarter-multiples → round-4 stable; the 1.5×IQR
    * bounds are 0.00375-steps → round-5 (round-4 would sit exactly on a
    * rounding boundary and is NOT engine-portable). */
  def q07QuartilesOutliers(orders: DataFrame): DataFrame = {
    val r = orders.agg(
      expr("percentile(o_totalprice, 0.25)"),
      expr("percentile(o_totalprice, 0.75)")).head()
    val (q1, q3) = (r.getDouble(0), r.getDouble(1))
    val iqr = q3 - q1
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (lo, hi) = (r5(q1 - 1.5 * iqr), r5(q3 + 1.5 * iqr))
    orders.agg(
      round(lit(q1), 4).as("q1"),
      round(lit(q3), 4).as("q3"),
      round(lit(iqr), 4).as("iqr"),
      lit(lo).as("lo"),
      lit(hi).as("hi"),
      sum((!col("o_totalprice").between(lo, hi)).cast("int")).as("n_outliers"))
  }

  def q07Sql: String =
    """WITH q AS (
      |  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
      |         quantile_cont(o_totalprice, 0.75) AS q3
      |  FROM orders
      |), b AS (
      |  SELECT q1, q3, round(q1 - 1.5*(q3-q1), 5) AS lo, round(q3 + 1.5*(q3-q1), 5) AS hi FROM q
      |)
      |SELECT round(b.q1, 4) AS q1, round(b.q3, 4) AS q3,
      |  round(b.q3 - b.q1, 4) AS iqr, b.lo AS lo, b.hi AS hi,
      |  cast(sum(CASE WHEN o_totalprice NOT BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END) AS bigint) AS n_outliers
      |FROM orders, b GROUP BY b.q1, b.q3, b.lo, b.hi""".stripMargin

  /** Median imputation (reference A2/A3): nulls injected via nullif,
    * filled with the exact median of the survivors — the same
    * agg→collect→fill barrier shape as CleanHistorical. */
  def q08MedianImpute(lineitem: DataFrame): DataFrame = {
    val masked = lineitem.withColumn("disc_m",
      when(col("l_discount") === 0.07, lit(null)).otherwise(col("l_discount")))
    val med = masked.agg(expr("percentile(disc_m, 0.5)")).head().getDouble(0)
    masked
      .withColumn("disc_f", coalesce(col("disc_m"), lit(med)))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("disc_m").isNull.cast("int")).as("n_imputed"),
        sumd(col("disc_f")).as("sum_disc_filled"))
      .orderBy("l_returnflag")
  }

  def q08Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, nullif(l_discount, 0.07) AS disc_m FROM lineitem
      |), med AS (SELECT quantile_cont(disc_m, 0.5) AS v FROM m)
      |SELECT l_returnflag, count(*) AS n,
      |  cast(sum(CASE WHEN disc_m IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_imputed,
      |  cast(sum(cast(coalesce(disc_m, med.v) AS decimal(18,4))) AS double) AS sum_disc_filled
      |FROM m, med GROUP BY l_returnflag, med.v ORDER BY l_returnflag""".stripMargin

  /** Fixed-bound histogram (profiling A8) — floor bucketing, one shuffle
    * on ≤ ~12 buckets. (DuckDB 1.0 lacks width_bucket; floor arithmetic
    * is portable and identical.) */
  def q11Histogram(orders: DataFrame): DataFrame =
    orders
      .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  def q11Sql: String =
    """SELECT cast(floor(o_totalprice / 50000.0) AS bigint) AS bucket, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** One-pass numeric profile (A8 core stats) — a single wide aggregate,
    * no second scan. */
  def q12Profile(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_quantity")).as("distinct_qty"),
      sum(col("l_quantity").isNull.cast("int")).as("nulls_qty"),
      avgd(col("l_extendedprice")).as("mean_price"),
      min("l_extendedprice").as("min_price"),
      max("l_extendedprice").as("max_price"),
      sum((col("l_discount") === 0.0).cast("int")).as("zeros_disc"),
      sum((col("l_extendedprice") < 0.0).cast("int")).as("neg_price"))

  def q12Sql: String =
    s"""SELECT count(*) AS n_rows,
       |  count(DISTINCT l_quantity) AS distinct_qty,
       |  cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS bigint) AS nulls_qty,
       |  ${avgdSql("l_extendedprice")} AS mean_price,
       |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
       |  cast(sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS bigint) AS zeros_disc,
       |  cast(sum(CASE WHEN l_extendedprice < 0.0 THEN 1 ELSE 0 END) AS bigint) AS neg_price
       |FROM lineitem""".stripMargin

  /** Pairwise Pearson correlation (profiling A10). */
  def q13Corr(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(lit(1)).as("n"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      round(corr(col("l_discount"), col("l_tax")), 6).as("corr_disc_tax"))

  def q13Sql: String =
    """SELECT count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(corr(l_discount, l_tax), 6) AS corr_disc_tax
      |FROM lineitem""".stripMargin

  /** Window ranking: top-3 orders per customer. One shuffle on
    * o_custkey; rank prune happens before the final sort. */
  def q14WindowRank(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  def q14Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Full-row duplicate census (reference A7) on documents.text. */
  def q10DupCount(documents: DataFrame): DataFrame =
    documents.agg(
      count(lit(1)).as("n_total"),
      countDistinct(col("text")).as("n_distinct_text"),
      (count(lit(1)) - countDistinct(col("text"))).as("n_dups"))

  def q10Sql: String =
    """SELECT count(*) AS n_total, count(DISTINCT text) AS n_distinct_text,
      |  count(*) - count(DISTINCT text) AS n_dups
      |FROM documents""".stripMargin
}
