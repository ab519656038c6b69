package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth: CSV, JSON-lines, and ORC ingestion with the same
  * declared-schema-at-the-boundary discipline as the parquet catalog
  * ([[Tables]]). The reference's landing zone is format-heterogeneous in
  * practice — the OLTP extract arrives as whatever the upstream emits
  * (reference scheduler/dataflow_flex_body.json source config; CSV/JSON are
  * the lingua franca of log shippers) — so a complete engine must scan all
  * three without weakening the typing or the scan-level optimizations.
  *
  * Design rules, each load-bearing at scale:
  *  - **Schemas are DECLARED, never inferred.** CSV/JSON inference costs a
  *    full extra pass over the data (Spark samples or scans to guess types)
  *    and can GUESS DIFFERENTLY as the data drifts — a silent schema change
  *    100 TB deep. Every reader here takes an explicit `StructType`.
  *  - **The interchange projection is integer-lossless.** Timestamps travel
  *    as epoch-µs longs and money as cents longs: text formats round-trip
  *    decimal integers exactly, whereas a double or a formatted timestamp
  *    would re-open the float-parsing ambiguity the engine eliminated at
  *    the parquet boundary.
  *  - **ORC keeps predicate pushdown.** Spark's ORC reader pushes filters
  *    into stripe/row-group selection exactly like parquet
  *    (`SourcesSpec` asserts the pushed filter) — so the columnar archive
  *    tier is scan-compatible with the hot tier.
  *  - CSV/JSON are ROW formats: no column pruning, no predicate pushdown,
  *    every scan reads every byte. The engine treats them as ingestion
  *    surfaces — land, normalize, convert to columnar — not as query
  *    targets; the queries here exist to prove the read path is correct,
  *    and their cost difference vs parquet is the argument for the
  *    convert-on-land pipeline ([[graft.pipeline.Pipeline]]).
  */
object Formats {

  /** Columns every format carries: one row per event, integer-exact. */
  val InterchangeSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_cents", LongType, nullable = false)))

  private def interchange(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("value_cents"))

  /** Stage-once cache, keyed by (session, fixture dir, format) — the
    * export is harness glue standing in for "what the upstream shipped",
    * written once per session and read by every query that exercises the
    * format (the [[graft.streaming.StreamOracle.stage]] convention).
    */
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), String]

  private def stage(spark: SparkSession, dir: String, format: String)
                   (write: (DataFrame, String) => Unit): String =
    staged.computeIfAbsent((spark, dir, format), _ => {
      val out = Files.createTempDirectory(s"graft_fmt_$format").toString
      write(interchange(Tables.events(spark, dir)), s"$out/data")
      s"$out/data"
    })

  /** CSV with a header row, RFC-4180 quoting left at Spark defaults. */
  def csvEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage(spark, dir, "csv") { (df, p) =>
      df.coalesce(4).write.option("header", "true").csv(p)
    }
    spark.read.schema(InterchangeSchema).option("header", "true").csv(path)
  }

  /** JSON-lines (one object per line — the log-shipper framing). */
  def jsonlEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage(spark, dir, "jsonl") { (df, p) =>
      df.coalesce(4).write.json(p)
    }
    spark.read.schema(InterchangeSchema).json(path)
  }

  /** ORC — columnar, with predicate pushdown and column pruning intact. */
  def orcEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = stage(spark, dir, "orc") { (df, p) =>
      df.coalesce(4).write.orc(p)
    }
    spark.read.schema(InterchangeSchema).orc(path)
  }

  /** Daily per-type rollup over a format read-back — the correctness probe
    * each format query runs: if the format round-trip bent ANY value, the
    * per-day integer sums diverge from the parquet oracle.
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(timestamp_micros(col("ts_us"))).as("date_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("sum_value_cents"))
}
