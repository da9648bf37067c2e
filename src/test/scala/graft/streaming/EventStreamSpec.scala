package graft.streaming

import graft.TestSpark
import graft.io.Tables
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch↔stream parity: the streaming operators fed the same events
  * (split across multiple micro-batches, exercising state carryover)
  * must produce exactly the batch q15/q16 results. */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def batches: (Seq[EventStream.Event], Seq[EventStream.Event]) = {
    import spark.implicits._
    val all = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event].collect().sortBy(e => (e.ts, e.event_id)).toSeq
    all.splitAt(all.length / 2)
  }

  test("streaming sessionization equals batch q15 across two micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2) = batches
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("update").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // Update mode: the LAST emitted row per user is the final state
      val got = spark.sql(
        """SELECT user_id, n_events, n_sessions FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id
          |    ORDER BY n_events DESC) AS rn FROM sessions_out) WHERE rn = 1
          |ORDER BY user_id""".stripMargin).collect()
      val want = EventOps.q15Sessionize(Tables.events(spark, sf)).collect()
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) === w.getLong(0))
        assert(g.getLong(1) === w.getLong(1), s"user ${g.getLong(0)} events")
        assert(g.getLong(2) === w.getLong(2), s"user ${g.getLong(0)} sessions")
      }
    } finally q.stop()
  }

  test("streaming hourly rollup equals batch q16") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2) = batches
    val input = MemoryStream[EventStream.Event]
    val withTs = input.toDF()
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    val rollup = EventStream.hourlyRollup(withTs)
    val q = rollup.writeStream.format("memory")
      .queryName("rollup_out").outputMode("complete").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = spark.sql(
        "SELECT * FROM rollup_out ORDER BY hour, event_type").collect()
      val want = EventOps.q16TimeRollup(Tables.events(spark, sf)).collect()
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) === w.getString(0))
        assert(g.getString(1) === w.getString(1))
        assert(g.getLong(2) === w.getLong(2))
        assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
      }
    } finally q.stop()
  }

  test("file streaming source reads the events parquet incrementally") {
    // stage the single-file testdata table as a directory of parts
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-00000.parquet"))
    val stream = EventStream.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventStream.hourlyRollup(stream)
      .writeStream.format("memory").queryName("file_rollup")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(n) FROM file_rollup").head().getLong(0) === 1000)
    } finally q.stop()
  }
}
