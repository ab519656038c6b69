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
  * No Postgres ships in this container (the parquet fixture plays the OLTP
  * source for the oracle gate — see `Analytics.extractWindow`), but the
  * extract itself round-trips against embedded Derby in SourcesSpec, with
  * Derby's statement log proving the window and partition-range predicates
  * execute database-side.
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

  /** SQL fragments that vary by source database. The default is the
    * reference's Postgres dialect; [[Dialect.derby]] covers the embedded
    * Derby the test suite round-trips through (SourcesSpec observes the
    * window predicate arriving in the database's own statement log).
    */
  final case class Dialect(epochSecExpr: String => String,
                           tsFromEpochExpr: Long => String)
  object Dialect {
    /** Postgres (the reference's OLTP source). */
    val postgres: Dialect = Dialect(
      c => s"CAST(EXTRACT(EPOCH FROM $c) AS BIGINT)",
      s => s"to_timestamp($s)")
    /** Apache Derby (embedded; used by the test suite). Derby has no epoch
      * functions, so both directions go through the JDBC escape/timestamp
      * literal forms. TIMESTAMPDIFF(SQL_TSI_SECOND,…) yields INTEGER —
      * fine until 2038, and cast up to BIGINT for the partition column.
      */
    def derby(zone: java.time.ZoneId): Dialect = Dialect(
      c => "CAST({fn TIMESTAMPDIFF(SQL_TSI_SECOND, " +
        s"TIMESTAMP('1970-01-01 00:00:00'), $c)} AS BIGINT)",
      s => {
        val wall = java.time.LocalDateTime
          .ofInstant(java.time.Instant.ofEpochSecond(s), zone)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))
        s"TIMESTAMP('$wall')"
      })
  }

  /** Windowed extract parallelized over `numPartitions` epoch-second ranges
    * of `tsCol` — each task pulls `[lo, hi)` ∩ its stride. The window
    * predicate ships inside the dbtable subquery, so the source database
    * prunes rows before they cross the wire.
    */
  def jdbcWindowed(spark: SparkSession, url: String, table: String,
                   tsCol: String, loEpochSec: Long, hiEpochSec: Long,
                   user: String, password: String,
                   numPartitions: Int = 8,
                   dialect: Dialect = Dialect.postgres): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("fetchsize", "10000")
    props.setProperty("partitionColumn", s"extract_epoch_s")
    props.setProperty("lowerBound", loEpochSec.toString)
    props.setProperty("upperBound", hiEpochSec.toString)
    props.setProperty("numPartitions", numPartitions.toString)
    val windowed =
      s"""(SELECT t.*, ${dialect.epochSecExpr(tsCol)} AS extract_epoch_s
         | FROM $table t
         | WHERE $tsCol >= ${dialect.tsFromEpochExpr(loEpochSec)}
         |   AND $tsCol < ${dialect.tsFromEpochExpr(hiEpochSec)}) AS extract_src""".stripMargin
    spark.read.jdbc(url, windowed, props)
  }
}
