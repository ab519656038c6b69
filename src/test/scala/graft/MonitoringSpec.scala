package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Monitoring

/** Monitoring-view semantics on constructed data: unparsable statuses are
  * dropped (P5/F9), success band is [50,99], last-status picks the newest.
  */
class MonitoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "jobA", 1.0, """{"k": 80}"""),
    (2L, ts("2024-01-01 11:00:00"), 1L, "jobA", 1.0, """{"k": 10}"""),
    (3L, ts("2024-01-01 12:00:00"), 1L, "jobA", 1.0, """{"k": "oops"}"""),
    (4L, ts("2024-01-01 09:00:00"), 2L, "jobB", 1.0, """{"other": 1}"""),
    (5L, ts("2024-01-02 09:00:00"), 2L, "jobB", 1.0, """{"k": 55}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("results drops rows whose status cannot be parsed") {
    val r = Monitoring.results(events).collect()
    assert(r.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L, 5L))
    assert(r.forall(row => !row.isNullAt(row.fieldIndex("status"))))
  }

  test("daily summary computes success counts and rate") {
    val d = Monitoring.dailySummary(events)
      .filter($"job_name" === "jobA").collect().head
    assert(d.getAs[Long]("runs") == 2L)
    assert(d.getAs[Long]("successes") == 1L) // only k=80 is in [50,99]
    assert(d.getAs[Long]("failures") == 1L)
    assert(d.getAs[Double]("success_rate") == 0.5)
  }

  test("last status picks the newest parseable row per job") {
    val last = Monitoring.lastStatus(events).collect()
      .map(r => r.getAs[String]("job_name") -> r.getAs[Long]("status")).toMap
    assert(last == Map("jobA" -> 10L, "jobB" -> 55L)) // k="oops" row ignored
  }

  test("errors view keeps only failures, newest first") {
    val e = Monitoring.errors(events).collect()
    assert(e.map(_.getAs[Long]("event_id")).toSeq == Seq(2L))
  }
}
