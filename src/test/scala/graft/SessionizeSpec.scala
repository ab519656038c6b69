package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Gap-based sessionization over constructed timelines: session breaks
  * exactly when the inactivity gap exceeds the threshold, per user.
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessions split on gaps over the threshold, per user") {
    val ts = (s: String) => Timestamp.valueOf(s)
    // user 1: 3 events 10 min apart (one session), then a 31-min gap (new
    // session); user 2: single event
    val dir = Files.createTempDirectory("graft-sess")
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "a", 1.0, "{}"),
      (3L, ts("2024-01-01 10:20:00"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 10:51:00"), 1L, "a", 1.0, "{}"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = graft.operators.Analytics.sessionize(spark, dir.toString, 30)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        r.getAs[Long]("n_events")).toMap
    assert(out == Map((1L, 1L) -> 3L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }

  test("native session_window: merge within gap, boundary event at exactly +gap MERGES (touching windows join)") {
    val ts = (s: String) => Timestamp.valueOf(s)
    val dir = Files.createTempDirectory("graft-sessw")
    // user 1: two events 10 min apart, then one at EXACTLY last+30min —
    // Spark merges touching [t, t+gap) windows, so it CONTINUES the
    // session (empirically pinned; the oracle's > test mirrors it) —
    // then one clearly past; user 2: out-of-order input, same session
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "a", 1.0, "{}"),
      (3L, ts("2024-01-01 10:40:00"), 1L, "a", 1.0, "{}"), // == e2 + 30min
      (4L, ts("2024-01-01 12:00:00"), 1L, "a", 1.0, "{}"),
      (6L, ts("2024-01-01 09:20:00"), 2L, "b", 1.0, "{}"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val us = (s: String) => ts(s).getTime * 1000L
    val out = graft.operators.Analytics
      .sessionWindowNative(spark, dir.toString, 30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 11:10:00"), 3L),
      (1L, us("2024-01-01 12:00:00"), us("2024-01-01 12:30:00"), 1L),
      (2L, us("2024-01-01 09:00:00"), us("2024-01-01 09:50:00"), 2L)))
  }
}
