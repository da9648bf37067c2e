package graft.operators

import graft.functions.{Classify, Exact}
import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators over the `events` table (nanosecond timestamps, JSON props).
  *
  * The parquet carries TIMESTAMP(NANOS), which Spark reads as a raw long
  * (see [[graft.io.Tables.events]]); all time arithmetic here works on
  * either the nanos long (exact, engine-portable) or a derived
  * microsecond timestamp. DuckDB oracle equivalents use epoch_ns /
  * strftime so both engines compare on identical values.
  */
object EventOps {

  /** Frequency count (reference A4 `value_counts()`). */
  def q05ValueCounts(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))

  def q05Sql: String =
    """SELECT event_type, count(*) AS n FROM events
      |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin

  /** Hourly rollup: time-bucketed aggregation. Bucket via string
    * formatting (identical in both engines; avoids timestamp-type
    * mismatches between Spark ntz and DuckDB ns). One shuffle on
    * (hour, type) — at scale, partition pruning comes from
    * date-partitioned layout, not this operator. */
  def q16TimeRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour", date_format(col("ts_utc"), "yyyy-MM-dd HH:00"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  def q16Sql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
       |  count(*) AS n, ${Exact.sumdSql("value")} AS sum_value
       |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  /** Sessionization: per-user session count with a 30-minute idle gap,
    * via lag over (user, time). The reference has no windows (SURVEY
    * §2.4) — this is the engine-completeness surface. Gap arithmetic on
    * raw nanos longs: exact in both engines. */
  def q15Sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapNs = col("ts") - lag(col("ts"), 1).over(w)
    events
      .withColumn("new_session",
        (gapNs.isNull || gapNs > lit(1800L * 1000 * 1000 * 1000)).cast("int"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           sum(col("new_session")).as("n_sessions"))
      .orderBy("user_id")
  }

  def q15Sql: String =
    """SELECT user_id, count(*) AS n_events, cast(sum(new_session) AS bigint) AS n_sessions
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id)
      |         > 1800000000000 IS NOT FALSE THEN 1 ELSE 0 END AS new_session
      |  FROM events) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** JSON field extraction + aggregation (semi-structured props column).
    * Integer sums are exact; the mean is derived from them. */
  def q17JsonExtract(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events
      .withColumn("k", k)
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_k"),
        sum(col("k").isNull.cast("int")).as("n_null_k"),
        sum(col("k")).cast("long").as("sum_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("mean_k"))
      .orderBy("event_type")
  }

  def q17Sql: String =
    """SELECT event_type, count(k) AS n_k,
      |  cast(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_k,
      |  cast(sum(k) AS bigint) AS sum_k,
      |  cast(sum(k) AS double) / count(k) AS mean_k
      |FROM (SELECT event_type,
      |        cast(json_extract_string(props, '$.k') AS int) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Trend classification (reference O11) applied to events.value as a
    * raw percentage — the when/otherwise ladder, codegen'd, no UDF. */
  def q19Classify(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("value"),
        Classify.classifyTrend(col("value")).as("tendencia"))
      .orderBy("event_id")

  def q19Sql: String = {
    val l = Classify.ColabLabels
    s"""SELECT event_id, value,
       |  CASE WHEN value / 100 >= 0.05 THEN '${l.strongUp}'
       |       WHEN value / 100 > 0.01 THEN '${l.moderateUp}'
       |       WHEN value / 100 <= -0.05 THEN '${l.strongDown}'
       |       WHEN value / 100 < -0.01 THEN '${l.moderateDown}'
       |       ELSE '${l.stable}' END AS tendencia
       |FROM events ORDER BY event_id""".stripMargin
  }

  /** Null census over extracted fields (reference O10). */
  def q09NullCensus(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events.agg(
      count(lit(1)).as("n_rows"),
      sum(k.isNull.cast("int")).as("n_null_k"),
      sum(col("value").isNull.cast("int")).as("n_null_value"),
      countDistinct(k).as("n_distinct_k"))
  }

  def q09Sql: String =
    """SELECT count(*) AS n_rows,
      |  cast(sum(CASE WHEN cast(json_extract_string(props, '$.k') AS int) IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_k,
      |  cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null_value,
      |  count(DISTINCT cast(json_extract_string(props, '$.k') AS int)) AS n_distinct_k
      |FROM events""".stripMargin
}
