package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream.
  *
  * The reference's "streaming" is a 6-hour batch cron (SURVEY §1.4);
  * this module is the engine-completeness path: the same event
  * operators (hourly rollup = q16, sessionization = q15) expressed as
  * incremental plans, so a deployment can switch batch↔streaming
  * without changing semantics. Batch/stream parity is pinned by
  * EventStreamSpec (same inputs → same results as the batch queries).
  *
  * At scale: the rollup is watermark-bounded state (late data beyond
  * 1 h dropped deterministically); sessionization keys state by
  * user_id — state size is O(active users), not O(events).
  */
object EventStream {

  case class Event(event_id: Long, ts: Long, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(lastTs: Long, nEvents: Long, nSessions: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  val SessionGapNs: Long = 1800L * 1000 * 1000 * 1000 // 30 min

  /** Streaming hourly rollup: watermarked event-time window + the same
    * exact-decimal aggregation as batch q16. Input needs an event-time
    * `ts_utc` timestamp column. */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.functions.Exact.sumd(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stateful sessionization via flatMapGroupsWithState: per-user state
    * is (last event time, counts); a gap > 30 min opens a new session.
    * Emits the updated per-user totals every batch (Update mode). */
  def sessionize(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, batch, state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = s.nEvents == 0 || e.ts - s.lastTs > SessionGapNs
            s = SessionState(e.ts, s.nEvents + 1,
              s.nSessions + (if (newSession) 1 else 0))
          }
          state.update(s)
          Iterator.single(UserSessions(uid, s.nEvents, s.nSessions))
      }
  }

  /** File-based streaming source over a DIRECTORY of event parquet
    * part-files (the production layout — FileStreamSource tails a
    * directory, discovering new parts incrementally; a bare single
    * file cannot be a stream basePath). `readStream` needs an explicit
    * schema, taken from the existing files. */
  def readEventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    // same two-layout normalization as the batch loader: `ts` becomes
    // epoch nanos (long) whether the files carry TIMESTAMP_NS or µs
    // TIMESTAMP
    graft.io.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(eventsDir))
      .withColumn("ts_utc",
        // integral div, not `/`: double division is lossy above 2^53 ns
        timestamp_micros(expr("ts div 1000")))
  }
}
