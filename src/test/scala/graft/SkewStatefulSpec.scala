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

  test("skew_salted_rollup/join queries: the salt split engages in the physical plan") {
    // the oracled queries (SparkEntry), not the unit fixtures: assert the
    // salt actually reshapes the plan — the rollup's FIRST aggregation
    // groups on (key, __salt) so the hot key's rows partial-aggregate
    // across salt buckets before the key-only final agg; the join's keys
    // carry __salt so the hot key spreads over saltBuckets tasks
    // the __salt alias is inlined by Catalyst as a `_groupingexpression`;
    // the load-bearing shape is a FIRST aggregation grouped on
    // (hot_key, <salt expr>) — two keys — followed by a key-only re-agg
    val rollup = SparkEntry.queries("skew_salted_rollup")(spark, "/root/testdata/sf0.001")
    val rollupAggs = rollup.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(rollupAggs.exists(l =>
        l.contains("keys=[hot_key") && l.substring(l.indexOf("keys=[")).takeWhile(_ != ']').contains(",")),
      s"salted rollup must pre-aggregate on (key, salt):\n${rollupAggs.mkString("\n")}")
    assert(rollupAggs.exists(l =>
        l.contains("keys=[key#") && !l.substring(l.indexOf("keys=[")).takeWhile(_ != ']').contains(",")),
      s"salted rollup must re-aggregate on the key alone:\n${rollupAggs.mkString("\n")}")

    val join = SparkEntry.queries("skew_salted_join")(spark, "/root/testdata/sf0.001")
    val joinPlan = join.queryExecution.executedPlan.toString
    val joinLines = joinPlan.linesIterator
      .filter(l => l.contains("Join") && l.contains("__salt")).toSeq
    assert(joinLines.nonEmpty,
      s"salted join must carry __salt in its join keys:\n$joinPlan")
  }

  /** The pipeline's own skew story, observed rather than claimed: the star
    * build's user join is hint-free (Star.factStar — dim_user grows with
    * the data, so no forced broadcast), which means a hot user lands on
    * AQE. This drives a 90%-one-user fact through the REAL factStar shape
    * with broadcast disabled (forcing the shuffle-join regime a 100-TB
    * user dim implies) and asserts OptimizeSkewedJoin actually split the
    * hot partition — `skew=true` in the final adaptive plan.
    *
    * The dim side is MATERIALIZED first, exactly like Pipeline.run (dims
    * land on disk before the star reads them) — and that layout is
    * load-bearing for skew handling: when dim_user instead feeds the join
    * straight from its building aggregate, the SMJ's right child is
    * HashAggregate-over-stage rather than a bare shuffle stage, and
    * OptimizeSkewedJoin's pattern cannot replicate that side, so the hot
    * partition stays whole (verified while writing this test). Salting
    * (Skew.saltedJoin) stays the fallback for such shapes.
    */
  test("AQE splits the hot user in the star build's hint-free user join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-sized skew thresholds: the hot partition (~90% of rows)
      // must exceed max(threshold, factor × median) to be split
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // keep AQE from folding everything into one partition first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val events = spark.range(300000).select(
        col("id").as("event_id"),
        when(col("id") % 10 =!= 0, lit(7L))
          .otherwise(pmod(col("id"), lit(1000))).as("user_id"),
        concat(lit("type_"), pmod(col("id"), lit(3))).as("event_type"),
        (timestamp_seconds(lit(1700000000L) + pmod(col("id"), lit(172800)))).as("ts"),
        (col("id") % 97).cast("double").as("value"))
      // materialize dim_user like the pipeline does (Pipeline.run writes
      // dims before the star reads them) — see the scaladoc above for why
      // the on-disk dim is what makes the skew split reachable
      val dimDir = java.nio.file.Files
        .createTempDirectory("graft-skew-dim").toString
      graft.operators.Dims.dimUser(events).write
        .mode("overwrite").parquet(dimDir)
      val star = graft.operators.Star.factStar(events,
        spark.read.parquet(dimDir),
        graft.operators.Dims.dimEventType(events),
        graft.operators.Dims.dimDate(events))
      // execute THIS QueryExecution (count()/write would plan a fresh one
      // and leave star's adaptive plan unfinalized)
      assert(star.queryExecution.toRdd.count() == 300000L,
        "star build must preserve the fact")
      val finalPlan = star.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin must split the hot user partition:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mapGroupsWithState state survives a checkpointed restart") {
    val in = java.nio.file.Files.createTempDirectory("graft-state-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-state-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-state-ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Stateful.UserEvent]].schema)
        .parquet(in).as[Stateful.UserEvent]
      val q = Stateful.runningUserTotals(stream)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Stateful.UserTotal], _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Seq(Stateful.UserEvent(1L, 2.0), Stateful.UserEvent(1L, 3.0),
      Stateful.UserEvent(2L, 1.0)).toDS().write.mode("append").parquet(in)
    runOnce()
    Seq(Stateful.UserEvent(1L, 5.0)).toDS().write.mode("append").parquet(in)
    runOnce()
    // the restarted query recovers user 1's state store entry (2 events,
    // 5.0) and folds the new event into it: the final emission must be the
    // CUMULATIVE (3, 10.0) — a lost state store would emit (1, 5.0), a
    // re-read of old files would double-count
    val latest = spark.read.parquet(out).groupBy($"user_id")
      .agg(max(struct($"n_events", $"sum_value")).as("s"))
      .select($"user_id", $"s.n_events", $"s.sum_value").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(latest == Map(1L -> ((3L, 10.0)), 2L -> ((1L, 1.0))))
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
