package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel and cohort analytics over the event stream — the product-
  * analytics queries (conversion, retention) every event warehouse
  * serves.
  *
  * All time arithmetic is integral microseconds (`ts div 1000` from the
  * nanosecond longs — integral div, never `/`, which detours through
  * double and corrupts the low digits above 2^53), so every derived
  * bucket and difference is exact integer math in both engines.
  */
object Funnels {

  private val WeekUs: Long = 7L * 24 * 3600 * 1000000L

  /** q49: signup→purchase conversion funnel. Per user: first signup,
    * then first purchase AT-OR-AFTER it; aggregate to funnel counts and
    * the exact mean time-to-convert. Two narrow aggregations + one
    * broadcast-able join on user_id — no event-level self-join ever
    * materializes (the per-user firsts reduce before joining). */
  def q49Funnel(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      expr("ts div 1000").as("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s0"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts"))
    val converted = signups
      .join(purchases, col("user_id") === col("p_user") && col("ts") >= col("s0"))
      .groupBy("user_id").agg(min(col("ts") - col("s0")).as("dt"))
    signups
      .join(converted.select(col("user_id").as("c_user"), col("dt")),
        col("user_id") === col("c_user"), "left")
      .agg(
        count(lit(1)).as("n_signup_users"),
        count(col("dt")).as("n_converted"),
        // integer-µs sum / integer count → one double division, exact
        // same operands in both engines
        round(sum(col("dt")).cast("double") / count(col("dt")), 4)
          .as("avg_convert_us"))
  }

  def q49Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts FROM events),
      |s AS (SELECT user_id, min(ts) AS s0 FROM ev
      |      WHERE event_type = 'signup' GROUP BY 1),
      |c AS (SELECT s.user_id, min(p.ts - s.s0) AS dt
      |      FROM s JOIN ev p ON p.user_id = s.user_id
      |       AND p.event_type = 'purchase' AND p.ts >= s.s0
      |      GROUP BY 1)
      |SELECT count(*) AS n_signup_users,
      |  count(c.dt) AS n_converted,
      |  round(cast(sum(c.dt) AS double) / count(c.dt), 4) AS avg_convert_us
      |FROM s LEFT JOIN c ON s.user_id = c.user_id""".stripMargin

  /** q50: weekly retention cohorts. Users are cohorted by the week of
    * their FIRST event; each later-week activity increments the
    * (cohort, offset) cell once per user. Week index = integral µs div
    * week-length — exact in both engines. Two shuffles on user_id,
    * then a small groupBy — the first-event table is user-cardinality
    * and broadcasts at any realistic scale. */
  def q50Cohort(events: DataFrame, maxOffset: Int = 3): DataFrame = {
    val ev = events.select(col("user_id"),
      expr(s"(ts div 1000) div $WeekUs").as("week"))
    val firsts = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(broadcast(firsts), "user_id")
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .filter(col("week_offset") <= maxOffset)
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  def q50Sql(maxOffset: Int = 3): String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |f AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
       |SELECT cohort_week, week - cohort_week AS week_offset,
       |  count(DISTINCT ev.user_id) AS n_users
       |FROM ev JOIN f ON ev.user_id = f.user_id
       |WHERE week - cohort_week <= $maxOffset
       |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin
}
