package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.RunLogGen
import graft.operators.Monitoring

/** Nested run-log monitoring: P2 dot-path projection, F9 try_cast guard,
  * S6 day-partition shard pruning (asserted against the physical plan), and
  * W2 last-status over the log shape.
  */
class RunLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2024-01-01 00:00 UTC, 10-minute cadence, 3 jobs, 12 days of logs
  private lazy val log = RunLogGen.runLog(spark, 12 * 144, 1704067200L)

  test("nested projection + try_cast keep only parseable statuses") {
    val r = Monitoring.resultsFromRunLog(log, "20240112")
    assert(r.columns.toSeq == Seq("timestamp", "job_name", "status", "request_url", "severity", "is_success"))
    assert(r.filter($"status".isNull).count() == 0)
    val statuses = r.select("status").distinct().collect().map(_.getLong(0)).toSet
    assert(statuses == Set(200L, 500L)) // "client-abort" rows dropped
  }

  test("7-day shard cutoff prunes old partitions — as a real PartitionFilter") {
    val dir = Files.createTempDirectory("graft-runlog").toString
    log.write.mode("overwrite").partitionBy("day_partition").parquet(dir)
    // explicit schema keeps the shard id a string (like _TABLE_SUFFIX)
    // instead of partition-type inference turning it into an int
    val fromDisk = spark.read.schema(log.schema).parquet(dir)
    val view = Monitoring.resultsFromRunLog(fromDisk, "20240112")
    // cutoff 20240105: only partitions 05..12 may be scanned
    val minDay = Monitoring.resultsFromRunLog(fromDisk, "20240112")
      .join(fromDisk.select($"timestamp", $"day_partition"), Seq("timestamp"))
      .agg(org.apache.spark.sql.functions.min("day_partition")).first().getString(0)
    assert(minDay >= "20240105")
    val plan = view.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("day_partition"), s"expected partition pruning in:\n$plan")
  }

  test("committed fixture: oracled query reads only the trailing-week shards") {
    val schema = RunLogGen.runLog(spark, 1, 1704067200L).schema
    val fromDisk = spark.read.schema(schema)
      .parquet(SparkEntry.RunLogFixture + "/run_log")
    val view = Monitoring.resultsFromRunLog(fromDisk, "20240112")
    assert(view.count() == 1064) // matches the DuckDB oracle row count
    val plan = view.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day_partition"),
      s"expected partition pruning in:\n$plan")
  }

  test("last status per job over the nested log") {
    val last = Monitoring.lastStatusFromRunLog(log, "20240112").collect()
    assert(last.length == 3)
    assert(last.map(_.getAs[String]("job_name")).toSet ==
      Set("job-0", "job-1", "job-2"))
  }

  // Hand-computed expectations for the rollup views. Fixture ids 0..1727;
  // the 20240105 cutoff keeps ids 576..1727 (1152 rows). Unparsable
  // client-aborts are ids ≡ 0 (mod 13): 13·45=585 .. 13·132=1716 → 88 rows,
  // so 1064 parseable. Failures (status 500) are ids ≡ 0 (mod 7) that are
  // NOT ≡ 0 (mod 13): 164 multiples of 7 minus 12 multiples of 91 → 152.
  test("daily summary over the nested log matches hand-computed counts") {
    val d = Monitoring.dailySummaryFromRunLog(log, "20240112")
    assert(d.columns.toSeq == Seq("event_date", "job_name", "total_runs",
      "success_runs", "failed_runs", "success_rate"))
    assert(d.count() == 8 * 3) // 8 surviving days × 3 jobs
    // day 2024-01-12 = ids 1584..1727: 11 client-aborts (13·122..13·132),
    // 20 multiples of 7 (7·227..7·246) minus 1 multiple of 91 (1638) → 19
    val last = d.filter($"event_date" === java.sql.Date.valueOf("2024-01-12"))
      .collect()
    assert(last.map(_.getAs[Long]("total_runs")).sum == 144 - 11)
    assert(last.map(_.getAs[Long]("failed_runs")).sum == 19)
    assert(last.map(_.getAs[Long]("success_runs")).sum == 133 - 19)
  }

  test("7-day summary over the nested log matches hand-computed counts") {
    val s = Monitoring.sevenDaySummaryFromRunLog(log, "20240112").collect()
    assert(s.length == 3)
    assert(s.map(_.getAs[Long]("runs_7d")).sum == 1064L)
    assert(s.map(_.getAs[Long]("success_7d")).sum == 912L)
    s.foreach { r =>
      val rate = r.getAs[Double]("success_rate_7d")
      assert(rate > 0.8 && rate < 0.95)
    }
  }

  test("streaming daily summary equals the batch run-log view") {
    val dir = Files.createTempDirectory("graft-runlog-stream")
    log.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(log.schema).parquet(dir.toString)
    val q = graft.streaming.StreamDedup.streamingRunLogDailySummary(stream)
      .writeStream.format("memory").queryName("runlog_daily_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Date]("event_date").toString,
        r.getAs[String]("job_name")) ->
        (r.getAs[Long]("total_runs"), r.getAs[Long]("success_runs"))
    val streamed = spark.table("runlog_daily_out").collect().map(key).toMap
    // batch view prunes to the trailing 7 day_partitions; compare that slice
    val batch = Monitoring.dailySummaryFromRunLog(log, "20240112")
      .select("event_date", "job_name", "total_runs", "success_runs")
      .collect().map(key).toMap
    assert(batch.nonEmpty)
    batch.foreach { case (k, v) => assert(streamed.get(k).contains(v), s"$k") }
  }

  test("daily summary file sink: checkpoint restart resumes without duplicate or lost windows") {
    val in = Files.createTempDirectory("graft-runlog-ckpt-in").toString
    val out = Files.createTempDirectory("graft-runlog-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-runlog-ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(log.schema).parquet(in)
      val q = graft.streaming.StreamDedup.streamingRunLogDailySummary(stream)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted() = spark.read.parquet(out).collect()
      .map(r => (r.getAs[java.sql.Date]("event_date").toString,
        r.getAs[String]("job_name")) ->
        (r.getAs[Long]("total_runs"), r.getAs[Long]("success_runs")))

    // first half of the log, then a checkpointed AvailableNow pass: append
    // mode emits exactly the day windows the watermark has closed
    log.filter($"day_partition" <= "20240108").write.mode("append").parquet(in)
    runOnce()
    val first = emitted()
    assert(first.nonEmpty, "first run must finalize at least one day window")
    assert(first.map(_._1).distinct.length == first.length,
      "duplicate (day, job) windows in the sink after run 1")

    // second half lands; the RESTARTED query must resume from the
    // checkpoint — reading only the new files, re-emitting nothing
    log.filter($"day_partition" > "20240108").write.mode("append").parquet(in)
    runOnce()
    val second = emitted()
    assert(second.map(_._1).distinct.length == second.length,
      "restart reprocessed data — duplicate (day, job) windows in the sink")
    assert(second.length > first.length,
      "restart must finalize the windows the new data closes")
    assert(first.toSet.subsetOf(second.toSet),
      "restart must not rewrite previously emitted windows")
    // every emitted window is exactly the batch answer over the full log
    // (today chosen so the batch cutoff prunes nothing)
    val batch = Monitoring.dailySummaryFromRunLog(log, "20240108").collect()
      .map(r => (r.getAs[java.sql.Date]("event_date").toString,
        r.getAs[String]("job_name")) ->
        (r.getAs[Long]("total_runs"), r.getAs[Long]("success_runs"))).toMap
    second.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: sink=$v batch=${batch.get(k)}")
    }
  }

  test("streaming last-status equals the batch run-log view") {
    val dir = Files.createTempDirectory("graft-runlog-laststatus")
    // stream the same trailing-7-day slice the batch view prunes to, so the
    // two sides see identical input
    val slice = log.filter($"day_partition" >= "20240105")
    slice.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(log.schema).parquet(dir.toString)
    val q = graft.streaming.StreamDedup.streamingRunLogLastStatus(stream)
      .writeStream.format("memory").queryName("runlog_last_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[String]("job_name") ->
        (r.getAs[java.sql.Timestamp]("timestamp"), r.getAs[Long]("status"),
          r.getAs[Boolean]("is_success"))
    val streamed = spark.table("runlog_last_out").collect().map(key).toMap
    val batch = Monitoring.lastStatusFromRunLog(log, "20240112")
      .collect().map(key).toMap
    assert(batch.size == 3)
    assert(streamed == batch)
  }

  test("streaming 7-day rolling summary: the tomorrow-ending window equals the batch view") {
    val dir = Files.createTempDirectory("graft-runlog-7d")
    val slice = log.filter($"day_partition" >= "20240105")
    slice.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(log.schema).parquet(dir.toString)
    val q = graft.streaming.StreamDedup.streamingRunLog7dSummary(stream)
      .writeStream.format("memory").queryName("runlog_7d_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[String]("job_name") ->
        (r.getAs[Long]("runs_7d"), r.getAs[Long]("success_7d"),
          r.getAs[Double]("success_rate_7d"))
    // the batch view is "trailing week as of today (20240112)": that is
    // exactly the sliding window covering [0105, 0113), i.e. the one whose
    // end is tomorrow
    val streamed = spark.table("runlog_7d_out")
      .filter($"window_end" === java.sql.Date.valueOf("2024-01-13"))
      .collect().map(key).toMap
    val batch = Monitoring.sevenDaySummaryFromRunLog(log, "20240112")
      .collect().map(key).toMap
    assert(batch.size == 3)
    assert(streamed == batch)
  }

  test("streaming errors equals the batch run-log view as a set") {
    val dir = Files.createTempDirectory("graft-runlog-errors")
    val slice = log.filter($"day_partition" >= "20240105")
    slice.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(log.schema).parquet(dir.toString)
    // stateless view → append mode, no watermark, zero streaming state
    val q = graft.streaming.StreamDedup.streamingRunLogErrors(stream)
      .writeStream.format("memory").queryName("runlog_errors_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("timestamp"), r.getAs[String]("job_name"),
        r.getAs[Long]("status"), r.getAs[String]("request_url"),
        r.getAs[String]("severity"))
    val streamed = spark.table("runlog_errors_out").collect().map(key).toSet
    // batch orders newest-first (presentation); the stream has no global
    // order — set equality is the equivalence that matters
    val batch = Monitoring.errorsFromRunLog(log, "20240112")
      .collect().map(key).toSet
    assert(batch.size == 152)
    assert(streamed == batch)
  }

  test("errors view keeps only 500s, with severity, newest first") {
    val e = Monitoring.errorsFromRunLog(log, "20240112").collect()
    assert(e.length == 152)
    assert(e.forall(_.getAs[Long]("status") == 500L))
    assert(e.forall(_.getAs[String]("severity") == "ERROR"))
    val times = e.map(_.getAs[java.sql.Timestamp]("timestamp").getTime)
    assert(times.zip(times.tail).forall { case (a, b) => a >= b })
  }
}
