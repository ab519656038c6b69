package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extraction surface (operator S1 in SURVEY.md §2.1).
  *
  * The reference's replication loop is a scheduled JDBC pull: a flex-template
  * job runs `SELECT … FROM public.vitals_events WHERE effective_ts >= NOW() -
  * INTERVAL '10 minutes'` against Postgres every 10 minutes (reference
  * scheduler/dataflow_flex_body.json:9, README.md:364). In this engine the
  * same extract is expressed as `spark.read.jdbc` — the windowed predicate is
  * embedded in the pushed-down query so the database, not Spark, prunes the
  * window.
  *
  * Untestable in this sandbox (no database; the parquet fixture plays the
  * OLTP source — see `Analytics.extractWindow`), but the API surface is part
  * of the source story a user of the reference expects.
  *
  * Scale notes:
  *  - A naive single-connection JDBC read lands the whole extract on one
  *    task. [[jdbcWindowed]] therefore exposes the partitioned read
  *    (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`): Spark
  *    issues one range-predicated query per partition, and the extract
  *    parallelizes across executors.
  *  - `fetchsize` defaults to 10k rows — JDBC drivers' own defaults
  *    (e.g. Postgres: stream-all) are tuned for OLTP cursors, not bulk
  *    extraction.
  */
object Extract {

  /** Arbitrary pushed-down query, single connection — the reference's exact
    * shape. Prefer [[jdbcWindowed]] when the window is large.
    */
  def jdbc(spark: SparkSession, url: String, query: String,
           user: String, password: String): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("fetchsize", "10000")
    spark.read.jdbc(url, s"($query) AS extract_src", props)
  }

  /** Windowed extract parallelized over `numPartitions` epoch-second ranges
    * of `tsCol` — each task pulls `[lo, hi)` ∩ its stride. The window
    * predicate ships inside the dbtable subquery, so the source database
    * prunes rows before they cross the wire.
    */
  def jdbcWindowed(spark: SparkSession, url: String, table: String,
                   tsCol: String, loEpochSec: Long, hiEpochSec: Long,
                   user: String, password: String,
                   numPartitions: Int = 8): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("fetchsize", "10000")
    props.setProperty("partitionColumn", s"extract_epoch_s")
    props.setProperty("lowerBound", loEpochSec.toString)
    props.setProperty("upperBound", hiEpochSec.toString)
    props.setProperty("numPartitions", numPartitions.toString)
    val windowed =
      s"""(SELECT t.*, CAST(EXTRACT(EPOCH FROM $tsCol) AS BIGINT) AS extract_epoch_s
         | FROM $table t
         | WHERE $tsCol >= to_timestamp($loEpochSec)
         |   AND $tsCol < to_timestamp($hiEpochSec)) AS extract_src""".stripMargin
    spark.read.jdbc(url, windowed, props)
  }
}
