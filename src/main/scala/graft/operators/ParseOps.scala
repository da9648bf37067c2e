package graft.operators

import graft.functions.Parsers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oracle-checkable exercise of the dirty-string parsers (reference
  * O5–O8) on synthetic data: dirty strings are CONSTRUCTED from integer
  * key columns (integer→string formatting is identical in every engine,
  * unlike double→string), pushed through the parsers, and compared
  * against a DuckDB oracle applying the same parse semantics.
  *
  * The golden-file tests in GoldenParitySpec already pin these parsers
  * to the reference's real data; this query pins them to an independent
  * engine at arbitrary scale. All parse logic is pure Column expressions
  * → whole-stage codegen, zero UDFs (SURVEY §4.2).
  */
object ParseOps {

  def q18ParseOps(lineitem: DataFrame): DataFrame = {
    // currency: "$<orderkey>,250.75" — or the reference's " $-   " sentinel
    val curStr = when(col("l_linenumber") === 1, lit(" $-   "))
      .otherwise(concat(lit("$"), col("l_orderkey").cast("string"), lit(",250.75")))
    // percent: "<suppkey>.5%" or the "-" sentinel
    val pctStr = when(col("l_linenumber") === 2, lit("-"))
      .otherwise(concat(col("l_suppkey").cast("string"), lit(".5%")))
    // magnitude: Million/Billion/unhandled-Thousand/empty/bare
    val magStr = when(col("l_linenumber") === 1, concat(col("l_partkey").cast("string"), lit(" Million")))
      .when(col("l_linenumber") === 2, concat(col("l_partkey").cast("string"), lit(" Billion")))
      .when(col("l_linenumber") === 3, concat(col("l_partkey").cast("string"), lit(" Thousand")))
      .when(col("l_linenumber") === 4, lit(""))
      .otherwise(col("l_partkey").cast("string"))
    // Sort FIRST on the narrow key columns, parse after: orderBy's
    // range partitioner samples its child, so sorting the parsed
    // projection would execute every parser twice (and shuffle wide
    // rows). The Project stays above the Sort in the optimized plan,
    // so the parsers run once, post-shuffle — 4× at sf0.1.
    lineitem
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Parsers.parseCurrency(curStr).as("parsed_currency"),
        Parsers.parsePercent(pctStr).as("parsed_pct"),
        // native Catalyst expression: same semantics as
        // Parsers.parseMagnitude, one scan per string (bench-relevant:
        // the when/otherwise tree re-evaluates its branch subtrees)
        graft.catalyst.native.parseMagnitude(magStr).as("parsed_mag"))
  }

  /** The oracle constructs the same strings and applies the documented
    * parse semantics (strip → try_cast; Million×1e6, Billion×1e9,
    * Thousand unhandled → null). */
  def q18Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  try_cast(replace(replace(replace(cur, '$', ''), ',', ''), ' ', '') AS double) AS parsed_currency,
      |  try_cast(replace(pct, '%', '') AS double) / 100 AS parsed_pct,
      |  CASE WHEN mag LIKE '% Million' THEN cast(try_cast(replace(mag, ' Million', '') AS double) * 1000000 AS bigint)
      |       WHEN mag LIKE '% Billion' THEN cast(try_cast(replace(mag, ' Billion', '') AS double) * 1000000000 AS bigint)
      |       WHEN mag = '' OR mag = '-' OR mag LIKE '% Thousand' THEN NULL
      |       ELSE cast(try_cast(mag AS double) AS bigint) END AS parsed_mag
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_linenumber = 1 THEN ' $-   '
      |         ELSE concat('$', cast(l_orderkey AS varchar), ',250.75') END AS cur,
      |    CASE WHEN l_linenumber = 2 THEN '-'
      |         ELSE concat(cast(l_suppkey AS varchar), '.5%') END AS pct,
      |    CASE WHEN l_linenumber = 1 THEN concat(cast(l_partkey AS varchar), ' Million')
      |         WHEN l_linenumber = 2 THEN concat(cast(l_partkey AS varchar), ' Billion')
      |         WHEN l_linenumber = 3 THEN concat(cast(l_partkey AS varchar), ' Thousand')
      |         WHEN l_linenumber = 4 THEN ''
      |         ELSE cast(l_partkey AS varchar) END AS mag
      |  FROM lineitem) t
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
}
