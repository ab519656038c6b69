package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Structured-Streaming incremental semantics: watermarked dropDuplicates
  * repairs overlapping-batch duplicates; tumbling-day aggregation rolls up.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup drops re-delivered events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // batch 1 + batch 2 overlap on event 2 (the 20-min lookback re-delivery);
    // data is added before start — AvailableNow snapshots available offsets
    // at query start, so later addData may never be processed
    input.addData(
      Ev(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(2L, ts("2024-01-01 10:05:00"), "a", 2.0))
    input.addData(
      Ev(2L, ts("2024-01-01 10:05:00"), "a", 2.0),
      Ev(3L, ts("2024-01-01 10:12:00"), "b", 3.0))
    val q = StreamDedup.dedupStream(input.toDF(), "20 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming sessionization closes sessions on event-time gaps") {
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Stateful.SessionEvent]
    // user 1: two events 10 min apart, then a >30-min gap, then a far-future
    // event that advances the watermark past both sessions' timeouts
    input.addData(
      Stateful.SessionEvent(1L, ts("2024-01-01 10:00:00")),
      Stateful.SessionEvent(1L, ts("2024-01-01 10:10:00")))
    input.addData(Stateful.SessionEvent(1L, ts("2024-01-01 11:00:00")))
    input.addData(Stateful.SessionEvent(2L, ts("2024-01-01 23:00:00")))
    val q = Stateful.streamingSessions(input.toDS(), 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("session_start_us"))).toSet
    val us = (s: String) => ts(s).getTime * 1000L
    // user 1's two sessions closed; user 2's session still open (not emitted)
    assert(out == Set(
      (1L, 2L, us("2024-01-01 10:00:00")),
      (1L, 1L, us("2024-01-01 11:00:00"))))
  }

  test("streaming sessionization extends a session backwards on out-of-order arrival") {
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Stateful.SessionEvent]
    // batch 1 opens a session at 10:20; batch 2 delivers a WITHIN-WATERMARK
    // event at 10:05 — earlier than the open session's start but inside the
    // gap, so it must extend the same session backwards (the old fold glued
    // it after the span and kept start at 10:20); a far event then closes it
    input.addData(Stateful.SessionEvent(1L, ts("2024-01-01 10:20:00")))
    input.addData(Stateful.SessionEvent(1L, ts("2024-01-01 10:05:00")))
    input.addData(Stateful.SessionEvent(2L, ts("2024-01-01 23:00:00")))
    val q = Stateful.streamingSessions(input.toDS(), 30)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_ooo").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("session_start_us"), r.getAs[Long]("session_end_us"))).toSet
    val us = (s: String) => ts(s).getTime * 1000L
    assert(out == Set(
      (1L, 2L, us("2024-01-01 10:05:00"), us("2024-01-01 10:20:00"))),
      s"out-of-order event must extend the session start backwards, got $out")
  }

  test("native session_window aggregation ≡ batch sessionize on the fixture") {
    // batch mode: session_window is usable directly over the events table;
    // its sessions must be exactly the window-based operator's, with
    // end = last event + gap (session_window's close vs sessionize's max ts)
    val gapUs = 30L * 60000000L
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"))
    val native = StreamDedup.sessionCounts(ev, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us") - gapUs, r.getAs[Long]("n_events"))).toSet
    val batch = graft.operators.Analytics.sessionize(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
    assert(native.nonEmpty && native == batch)
  }

  test("session boundary: an event EXACTLY gap after its predecessor continues the session, batch ≡ native") {
    // the fixture's timestamps never land exactly on the gap boundary, so
    // the equivalence test above cannot distinguish `>` from `>=` — this
    // one can: 10:00 and 10:30 are exactly 30 min apart. Measured native
    // behavior: the 10:30 event's window [10:30, 11:00) TOUCHES the open
    // session's close (10:00+30min) and Spark's session merge treats
    // touching as overlapping — one merged session. sessionize's strict
    // `>` break matches; flipping it to `>=` makes batch and stream
    // silently diverge on exactly this input (verified: this test catches
    // that flip).
    val dir = java.nio.file.Files.createTempDirectory("sess-boundary").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 7L, "a", 2.0, "{}"),
      (3L, ts("2024-01-01 10:45:00"), 7L, "a", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def us(s: String) = ts(s).getTime * 1000L
    val batch = graft.operators.Analytics.sessionize(spark, dir, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
    assert(batch == Set(
      (7L, us("2024-01-01 10:00:00"), us("2024-01-01 10:45:00"), 3L)),
      s"exact-gap event must continue the session in batch, got $batch")
    val gapUs = 30L * 60000000L
    val native = StreamDedup.sessionCounts(
        graft.sources.Tables.events(spark, dir), 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us") - gapUs, r.getAs[Long]("n_events"))).toSet
    assert(native == batch,
      s"native session_window must agree on the boundary: $native vs $batch")
  }

  test("streaming session_window emits watermark-closed sessions like batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // user 1 (via event_id as the key source below we reuse event_id):
    // two gap-separated sessions; the late 12:00 event closes the first
    // once the watermark (driven by max event time) passes 10:05 + gap
    input.addData(
      Ev(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(1L, ts("2024-01-01 10:05:00"), "a", 2.0))
    input.addData(
      Ev(1L, ts("2024-01-01 12:00:00"), "a", 3.0),
      Ev(1L, ts("2024-01-01 14:00:00"), "a", 4.0))
    val keyed = input.toDF()
      .withColumnRenamed("event_id", "user_id")
    val q = StreamDedup.sessionCounts(keyed, 30, "10 minutes")
      .writeStream.format("memory").queryName("sess_native_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // watermark after the second batch = 14:00 - 10 min; sessions closing
    // before it (10:00-10:35, 12:00-12:30) are emitted, the 14:00 one stays open
    def us(s: String) = ts(s).getTime * 1000L
    val out = spark.table("sess_native_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
    assert(out == Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:35:00"), 2L),
      (1L, us("2024-01-01 12:00:00"), us("2024-01-01 12:30:00"), 1L)))
  }

  test("tumbling daily counts aggregate per day and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(
      Ev(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Ev(2L, ts("2024-01-01 11:00:00"), "a", 2.0),
      Ev(3L, ts("2024-01-02 10:00:00"), "b", 3.0))
    val q = StreamDedup.dailyCounts(input.toDF(), "20 minutes")
      .writeStream.format("memory").queryName("daily_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("daily_out").collect()
      .map(r => (r.getAs[Timestamp]("day_start").toString, r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_events")).toMap
    assert(out == Map(
      ("2024-01-01 00:00:00.0", "a") -> 2L,
      ("2024-01-02 00:00:00.0", "b") -> 1L))
  }
}
