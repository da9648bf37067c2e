package graft.operators

import org.apache.spark.sql.DataFrame
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
