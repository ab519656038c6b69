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
    assert(r.columns.toSeq == Seq("timestamp", "job_name", "status", "request_url", "is_success"))
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

  test("last status per job over the nested log") {
    val last = Monitoring.lastStatusFromRunLog(log, "20240112").collect()
    assert(last.length == 3)
    assert(last.map(_.getAs[String]("job_name")).toSet ==
      Set("job-0", "job-1", "job-2"))
  }
}
