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
}
