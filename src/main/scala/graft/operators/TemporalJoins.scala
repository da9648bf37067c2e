package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators Spark lacks as primitives,
  * composed from built-ins per the preference order in SURVEY §7.3
  * (compose > custom plan): the classic union+running-last formulation
  * for as-of, broadcast + range predicate for range join.
  */
object TemporalJoins {

  /** q36: as-of join WITHIN events — for every purchase, the most
    * recent signup of the same user at-or-before the purchase time.
    *
    * Formulation: tag both streams, sort by (user, ts), carry the last
    * seen signup ts forward with a running `max(...) over (unbounded
    * preceding → current)`, keep the purchases. ONE shuffle on user_id
    * and no join at all — this is the shape that scales: an as-of via
    * equi-join + per-row subquery would be O(n·m), and Spark's SMJ
    * cannot express "latest ≤" directly.
    *
    * The DuckDB oracle runs its NATIVE ASOF JOIN — so this pins our
    * composition to the reference semantics of a real as-of operator.
    * No dedup of the right side is needed: only the signup TIMESTAMP
    * is carried (running max), so duplicate signups at one (user, ts)
    * are output-invisible on both engines.
    *
    * Both sides work in MICROseconds (nanos floor-div 1000): DuckDB
    * reads the parquet TIMESTAMP(NANOS) at µs precision, so comparing
    * at ns here would disagree whenever two events share a µs. */
  def q36AsofJoin(events: DataFrame): DataFrame = {
    // `ts div 1000`, NOT `/`: Divide promotes to double and 1.7e18 ns
    // exceeds double's 53-bit mantissa (off-by-1 µs on real data).
    val evUs = events.withColumn("ts", expr("ts div 1000"))
    val purchases = evUs.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val tagged = purchases
      .withColumn("is_left", lit(1))
      .unionByName(
        evUs.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            lit(null).cast("long").as("event_id"),
            lit(null).cast("double").as("value"),
            lit(0).as("is_left")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_left")) // signup sorts before an equal-ts purchase
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_signup_ts",
        max(when(col("is_left") === 0, col("ts"))).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("asof_signup_ts"))
      .orderBy("event_id")
  }

  def q36Sql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS ts, event_id, value
      |           FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, epoch_us(ts) AS ts, max(event_id) AS s_event_id
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS asof_signup_ts
      |FROM p ASOF LEFT JOIN s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  /** q37: range join — band lineitems into quantity brackets. The
    * bracket table is tiny and broadcast; the range predicate runs as
    * a BroadcastNestedLoopJoin, which IS the right plan (a shuffle
    * range join of a 5-row table would be absurd; for two large sides
    * the scale path is binning both sides to an equi-join key first). */
  val Brackets: Seq[(String, Double, Double)] = Seq(
    ("XS", 0.0, 10.0), ("S", 10.0, 20.0), ("M", 20.0, 30.0),
    ("L", 30.0, 40.0), ("XL", 40.0, 51.0))

  def q37RangeJoin(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val brackets = Brackets.toDF("bracket", "lo", "hi")
    lineitem
      .join(broadcast(brackets),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("bracket")
      .agg(count(lit(1)).as("n"),
           graft.functions.Exact.sumd(col("l_extendedprice")).as("sum_price"))
      .orderBy("bracket")
  }

  def q37Sql: String = {
    val values = Brackets
      .map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")
    s"""SELECT bracket, count(*) AS n,
       |  cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double) AS sum_price
       |FROM lineitem
       |JOIN (VALUES $values) AS br(bracket, lo, hi)
       |  ON l_quantity >= lo AND l_quantity < hi
       |GROUP BY bracket ORDER BY bracket""".stripMargin
  }
}
