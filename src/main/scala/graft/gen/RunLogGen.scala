package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic run-log fixture generator — the engine's stand-in for the
  * reference's log-sink export tables (operator S8; reference
  * README.md:706-721): nested RECORD fields
  * (`resource.labels.job_id`, `httpRequest.status`,
  * monitoring/scheduler_executions_results_vw.sql:4-7), string-typed
  * statuses including unparsable values (exercises SAFE_CAST → try_cast),
  * and a `day_partition` column standing in for `_TABLE_SUFFIX` date
  * sharding (results_vw.sql:10-11).
  */
object RunLogGen {

  /** `n` log rows across `jobs` jobs, one execution every 10 minutes
    * starting at `startEpochSec`. ~1/13 rows carry an unparsable status
    * (client-abort style), matching the fixture spec in FIXTURES.md §A.
    */
  def runLog(spark: SparkSession, n: Long, startEpochSec: Long, jobs: Int = 3): DataFrame =
    spark.range(n).select(
      timestamp_seconds(lit(startEpochSec) + col("id") * 600).as("timestamp"),
      struct(struct(
        concat(lit("job-"), pmod(col("id"), lit(jobs))).as("job_id")).as("labels"))
        .as("resource"),
      struct(
        when(pmod(col("id"), lit(13)) === 0, lit("client-abort"))
          .when(pmod(col("id"), lit(7)) === 0, lit("500"))
          .otherwise(lit("200")).as("status"),
        concat(lit("https://svc.example/run/"), col("id")).as("requestUrl"))
        .as("httpRequest"),
      when(pmod(col("id"), lit(7)) === 0, lit("ERROR")).otherwise(lit("INFO"))
        .as("severity"),
      date_format(timestamp_seconds(lit(startEpochSec) + col("id") * 600), "yyyyMMdd")
        .as("day_partition"))
}
