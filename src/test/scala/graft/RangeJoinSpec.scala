package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Range join: bucketized equi-join ≡ the naive inequality join, without
  * ever planning a nested-loop product.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the naive inequality join, incl. boundaries and multi-hits") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 31L), (5L, 99L))
      .toDF("p_id", "ts")
    val intervals = Seq((10L, 10L, 30L), (11L, 0L, 7L), (12L, 24L, 26L))
      .toDF("i_id", "s", "e")
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e",
        bucketWidth = 8L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("ts") >= col("s") && col("ts") <= col("e"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive == Set((1L, 11L), (2L, 10L), (3L, 10L), (3L, 12L)),
      "fixture sanity: boundary hits (ts=10) and multi-interval hits (ts=25)")
    assert(got == naive)
  }

  test("no pair matches twice even when an interval spans many buckets") {
    val points = Seq((1L, 50L)).toDF("p_id", "ts")
    val intervals = Seq((10L, 0L, 1000L)).toDF("i_id", "s", "e")
    val rows = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e", 7L)
    assert(rows.count() == 1L)
  }

  test("plans as an equi-join, never a nested-loop product") {
    val points = spark.range(1000).select(col("id").as("p_id"), (col("id") * 3).as("ts"))
    val intervals = spark.range(100)
      .select(col("id").as("i_id"), (col("id") * 30).as("s"), (col("id") * 30 + 50).as("e"))
    val plan = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e", 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("interval overlap matches the naive join exactly once per pair") {
    val left = Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, 90L, 95L))
      .toDF("a_id", "as", "ae")
    val right = Seq((10L, 8L, 12L), (11L, 50L, 60L), (12L, 200L, 300L))
      .toDF("b_id", "bs", "be")
    val got = RangeJoin.intervalOverlap(left, "as", "ae", right, "bs", "be",
        bucketWidth = 7L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.join(right, col("as") <= col("be") && col("bs") <= col("ae"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L)))
    assert(got.length == got.toSet.size, "each overlapping pair must emit once")
    assert(got.toSet == naive.toSet)
  }

  test("extra equi-keys restrict matches within the key") {
    val points = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("p_id", "k", "ts")
    val intervals = Seq(("a", 0L, 10L)).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e", 4L,
        extraKeys = Seq("k"))
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
