package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dims
import graft.sources.Tables

/** Calendar + entity dimension properties (SURVEY.md §5). */
class DimsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("dim_date is contiguous and spans the fact's min..max dates") {
    val d = Dims.dimDate(events).orderBy("date_id").collect()
    assert(d.nonEmpty)
    val dates = d.map(_.getAs[Date]("date_id").toLocalDate)
    dates.sliding(2).foreach { case Array(a, b) => assert(b == a.plusDays(1)); case _ => }
    assert(d.length == (dates.last.toEpochDay - dates.head.toEpochDay + 1))
  }

  test("dim_date date parts are correct (2024-01-06 is a Saturday)") {
    val row = Dims.dimDate(events)
      .filter($"date_id" === Date.valueOf("2024-01-06")).collect().head
    assert(row.getAs[Long]("date_key") == 20240106L)
    assert(row.getAs[Int]("year") == 2024)
    assert(row.getAs[Int]("quarter") == 1)
    assert(row.getAs[String]("month_name") == "January")
    assert(row.getAs[String]("day_name") == "Saturday")
    assert(row.getAs[Int]("day_of_week") == 7) // BQ/Spark convention: 1=Sunday
    assert(row.getAs[Boolean]("is_weekend"))
    assert(row.getAs[Int]("iso_week") == 1)
  }

  test("dim_user event_count reconciles with the fact row count") {
    val total = Dims.dimUser(events).agg(org.apache.spark.sql.functions.sum("event_count"))
      .first().getLong(0)
    assert(total == events.count())
  }

  test("surrogate keys are deterministic sha256 hex") {
    val k = Dims.dimUser(events).filter($"user_id" === 0L)
      .select("user_key").first().getString(0)
    // sha256("0") — content hash, re-derivable on any rebuild (F1)
    assert(k == "5feceb66ffc86f38d952786c6d696c79c2dbc239dd4e91b46729d73a27fb57e9")
  }
}
