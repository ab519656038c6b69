package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Monitoring}
import graft.pipeline.Views
import graft.sources.Tables

/** The SQL surface: a reference user's SELECT-against-views workflow must
  * produce the same results as the DataFrame API over the same fixture.
  */
class ViewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("SQL star rollup over registered views matches the DataFrame form") {
    Views.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT d.date_id, count(*) AS n_events
        |FROM fact_events_star f JOIN dim_date d ON f.date_key = d.date_key
        |GROUP BY d.date_id""".stripMargin)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val fact = Dedup.latestEvents(Tables.events(spark, dir))
    val df = fact.groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("date_id"))
      .count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(sql == df)
    assert(sql.values.sum > 0)
  }

  test("SQL monitoring query matches the DataFrame form") {
    Views.registerAll(spark, dir)
    val sqlN = spark.sql(
      "SELECT count(*) FROM mon_results WHERE status BETWEEN 50 AND 99")
      .first().getLong(0)
    val dfN = Monitoring.results(Tables.events(spark, dir))
      .filter(org.apache.spark.sql.functions.col("is_success")).count()
    assert(sqlN == dfN && sqlN > 0)
  }
}
