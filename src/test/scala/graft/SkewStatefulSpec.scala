package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.streaming.Stateful

/** Salted aggregation/join correctness and mapGroupsWithState accumulation. */
class SkewStatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted sum/count equals direct aggregation on a skewed key") {
    // 90% of rows on one hot key
    val df = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"),
        lit(1.0).as("v"))
    val salted = Skew.saltedSumCount(df, $"k", $"v")
      .orderBy("key").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    val direct = df.groupBy($"k".as("key"))
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy("key").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    assert(salted.sameElements(direct))
  }

  test("salted join equals plain join on a skewed key") {
    val left = spark.range(5000).select((($"id" % 3) === 0).cast("long").as("k"), $"id")
    val right = Seq((0L, "cold"), (1L, "hot")).toDF("k", "label")
    val salted = Skew.saltedJoin(left, right, "k")
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("label").count().orderBy("label").collect().toSeq ==
      plain.groupBy("label").count().orderBy("label").collect().toSeq)
  }

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Stateful.UserEvent]
    // default micro-batch trigger: AvailableNow would terminate after the
    // first drain and never see the second batch
    val q = Stateful.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode("update").start()
    input.addData(Stateful.UserEvent(1L, 2.0), Stateful.UserEvent(1L, 3.0),
      Stateful.UserEvent(2L, 1.0))
    q.processAllAvailable()
    input.addData(Stateful.UserEvent(1L, 5.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends updated rows per batch; the latest
    // row per user carries the accumulated state
    val latest = spark.table("totals_out").groupBy($"user_id")
      .agg(max(struct($"n_events", $"sum_value")).as("s"))
      .select($"user_id", $"s.n_events", $"s.sum_value").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(latest == Map(1L -> ((3L, 10.0)), 2L -> ((1L, 1.0))))
  }
}
