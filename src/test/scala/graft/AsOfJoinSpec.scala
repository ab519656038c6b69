package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: latest right row at-or-before each left timestamp,
  * per key; nulls before any right row; equal timestamps match (>=).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks latest at-or-before right value per key") {
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (2L, ts("2024-01-01 11:00:00"), 100L),
      (3L, ts("2024-01-01 13:00:00"), 100L),
      (4L, ts("2024-01-01 10:00:00"), 200L) // other key: no right rows
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1.0),
      (100L, ts("2024-01-01 11:00:00"), 2.0), // equal ts as left id=2 → matches
      (100L, ts("2024-01-01 12:00:00"), 3.0)
    ).toDF("user_id", "ts", "price")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", Map("price" -> "asof_price"))
      .orderBy("event_id").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_price")).map(_.toDouble))
    assert(out.toSeq == Seq(
      1L -> None,        // 09:00 before any right row
      2L -> Some(2.0),   // >= matches the 11:00 right row
      3L -> Some(3.0),   // latest before 13:00
      4L -> None))       // different key
  }
}
