package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches with ENGINE-PORTABLE determinism.
  *
  * Spark's own approximate aggregates (HLL++, approx_percentile) are
  * implementation-defined — their estimates can't be compared across
  * engines. A K-Minimum-Values sketch over the portable md5-prefix
  * hash IS deterministic: the k smallest hashes of a set are a pure
  * function of the set, so Spark and DuckDB derive identical sketches
  * and identical estimates (Bar-Yossef et al. 2002; the distinct-count
  * estimator is (k-1)·2^60 / h_k for a hash uniform on [0, 2^60)).
  *
  * Scale shape: the k-smallest pass is `ORDER BY h LIMIT k` =
  * TakeOrderedAndProject — per-partition top-k heaps merged on the
  * driver, NO global sort, NO single-partition window; and KMV sketches
  * merge (union = k smallest of the concatenation), so per-split
  * sketches combine associatively at 100 TB.
  */
object Sketches {

  val KmvK = 256
  private val HashSpace = math.pow(2.0, 60).toLong // md5 15-hex-digit prefix

  /** q46: KMV distinct-count estimate of lineitem's order keys,
    * side-by-side with the exact count (the estimator's quality is part
    * of the result: |est/exact - 1| ≲ 1/√k ≈ 6 %). */
  def q46KmvDistinct(lineitem: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val kmv = lineitem.select(h.as("h")).distinct()
      .orderBy("h").limit(KmvK)
      .agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
    val exact = lineitem.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    kmv.crossJoin(exact)
      .select(
        col("k"),
        col("hk"),
        round(lit(KmvK - 1).cast("double") * lit(HashSpace).cast("double")
          / col("hk").cast("double"), 4).as("est_distinct"),
        col("exact_distinct"))
  }

  /** q57: per-GROUP KMV — distinct users per event type, sketch +
    * exact side by side. The grouped complement of q46: one sketch per
    * group, each mergeable across splits. The rank filter compiles to
    * WindowGroupLimit (per-partition per-group top-k heaps before the
    * shuffle — never a full sort of the group). A group with fewer than
    * k distinct values has an unfilled sketch, where the estimate IS
    * the exact member count (both branches are exercised: sf0.001 has
    * 15 users/group < k, sf0.01 has 150 > k). */
  val GroupKmvK = 64

  def q57GroupedKmv(events: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("event_type").orderBy("h")
    val kmv = events.select(col("event_type"), h.as("h")).distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= GroupKmvK)
      .groupBy("event_type").agg(max("h").as("hk"), count(lit(1)).as("k"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_distinct"))
    kmv.join(exact, "event_type")
      .select(col("event_type"), col("k"), col("hk"),
        when(col("k") < GroupKmvK, col("k").cast("double"))
          .otherwise(round(lit(GroupKmvK - 1).cast("double")
            * lit(HashSpace).cast("double") / col("hk").cast("double"), 4))
          .as("est_distinct"),
        col("exact_distinct"))
      .orderBy("event_type")
  }

  def q57Sql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |             cast(concat('0x', substr(md5(cast(user_id AS varchar)), 1, 15)) AS bigint) AS h
       |           FROM events),
       |r AS (SELECT event_type, h,
       |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |kmv AS (SELECT event_type, max(h) AS hk, count(*) AS k
       |        FROM r WHERE rn <= $GroupKmvK GROUP BY 1),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       |       FROM events GROUP BY 1)
       |SELECT event_type, k, hk,
       |  CASE WHEN k < $GroupKmvK THEN cast(k AS double)
       |       ELSE round(cast(${GroupKmvK - 1} AS double) * cast($HashSpace AS double)
       |              / cast(hk AS double), 4) END AS est_distinct,
       |  exact_distinct
       |FROM kmv JOIN ex USING (event_type) ORDER BY event_type""".stripMargin

  /** q59: sampled quantiles with a REPRODUCIBLE sample — the
    * engine-portable alternative to t-digest/GK sketches (whose
    * estimates are implementation-defined and can never hash-match
    * across engines). A deterministic 1-in-`rate` hash sample of the
    * rows feeds the exact type-7 percentile; the sample is a pure
    * function of the data, so Spark and DuckDB compute quantiles of the
    * IDENTICAL subset. Exact full-data quantiles ride along so the
    * result exhibits its own estimation error. At scale the single
    * exact-percentile reducer sees N/rate rows — the knob that makes
    * exact interpolation affordable.
    *
    * The exact ride-along's own scale story is the canonical session's
    * [[graft.catalyst.ApproxAboveThreshold]] valve (on by default since
    * round 4): above the size threshold the unconditional full-data
    * `percentile` — the one remaining single-reducer funnel here —
    * rewrites to the mergeable approx sketch (array form included;
    * pinned by CatalystExtensionsSpec), while every at-threshold-or-below
    * run, including the oracle gates, stays exact. */
  val SampleRate = 20

  def q59SampledQuantiles(lineitem: DataFrame): DataFrame = {
    val h = conv(substring(md5(
      concat(col("l_orderkey"), lit("-"), col("l_linenumber"))), 1, 15), 16, 10)
      .cast("long") % SampleRate
    // ONE percentile aggregate per side (array form): the quantile
    // buffer is built once and probed three times, instead of three
    // independent single-reducer collection passes. (An r16 attempt to
    // fuse BOTH sides into one aggregate measured SLOWER — 2.8 → 4.0 s
    // zero-suspect — because the partial-agg buffers then carry the
    // full value collection twice through one exchange/reducer; the
    // two-job form keeps each collection on its own reducer.)
    val sampled = lineitem.filter(h === 0)
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("q"),
           count(lit(1)).as("n_sampled"))
      .select(
        round(element_at(col("q"), 1), 4).as("est_p50"),
        round(element_at(col("q"), 2), 4).as("est_p90"),
        round(element_at(col("q"), 3), 4).as("est_p99"),
        col("n_sampled"))
    val exact = lineitem
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("q"))
      .select(
        round(element_at(col("q"), 1), 4).as("exact_p50"),
        round(element_at(col("q"), 2), 4).as("exact_p90"),
        round(element_at(col("q"), 3), 4).as("exact_p99"))
    sampled.crossJoin(exact)
  }

  def q59Sql: String = {
    val h = "cast(concat('0x', substr(md5(concat(l_orderkey, '-', l_linenumber)), 1, 15)) AS bigint)"
    s"""WITH s AS (SELECT l_extendedprice FROM lineitem WHERE ($h % $SampleRate) = 0)
       |SELECT
       |  round(quantile_cont(l_extendedprice, 0.5), 4) AS est_p50,
       |  round(quantile_cont(l_extendedprice, 0.9), 4) AS est_p90,
       |  round(quantile_cont(l_extendedprice, 0.99), 4) AS est_p99,
       |  count(*) AS n_sampled,
       |  (SELECT round(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem) AS exact_p50,
       |  (SELECT round(quantile_cont(l_extendedprice, 0.9), 4) FROM lineitem) AS exact_p90,
       |  (SELECT round(quantile_cont(l_extendedprice, 0.99), 4) FROM lineitem) AS exact_p99
       |FROM s""".stripMargin
  }

  def q46Sql: String =
    s"""WITH h AS (SELECT DISTINCT cast(concat('0x', substr(md5(cast(l_orderkey AS varchar)), 1, 15)) AS bigint) AS h
       |           FROM lineitem),
       |kmv AS (SELECT max(h) AS hk, count(*) AS k
       |        FROM (SELECT h FROM h ORDER BY h LIMIT $KmvK) t)
       |SELECT k, hk,
       |  round(cast(${KmvK - 1} AS double) * cast($HashSpace AS double)
       |    / cast(hk AS double), 4) AS est_distinct,
       |  (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact_distinct
       |FROM kmv""".stripMargin
}
