package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming form of the reference's incremental semantics
  * (SURVEY.md §2.9). The reference is cron-driven micro-batch: 10-minute
  * replication with a 20-minute lookback (deliberate overlap ⇒ duplicates,
  * reference README.md:364,382) repaired downstream by keep-latest dedup
  * (sql/bq_fact_vitals.sql:14-17). In continuous form:
  *
  *  - the 20-minute lookback becomes the watermark delay (bounds dedup
  *    state exactly like the lookback bounds reprocessing);
  *  - the downstream dedup becomes `dropDuplicates("event_id")` with that
  *    watermark — state is evicted once an event can no longer reappear;
  *  - the daily group-by-date rollup (A6) becomes a 1-day tumbling window.
  *
  * Scale: dedup state is hash-partitioned on event_id across executors;
  * the watermark keeps per-executor state bounded by (rate × delay).
  */
object StreamDedup {

  /** Exactly-once repair for an overlapping-replication stream. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Tumbling daily counts per event_type with late-data tolerance. */
  def dailyCounts(events: DataFrame, watermarkDelay: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** foreachBatch MERGE analog (SURVEY.md §2.9 "streaming: dropDuplicates…
    * or foreachBatch + MERGE"): each micro-batch is merged into a parquet
    * snapshot by key — existing rows are replaced by newer versions,
    * keep-latest per key, written as an idempotent overwrite. This is the
    * upsert shape for sinks without native MERGE; on a table format with
    * MERGE INTO the same foreachBatch body becomes one SQL statement.
    */
  def mergeBatchIntoSnapshot(spark: org.apache.spark.sql.SparkSession,
                             batch: DataFrame, snapshotPath: String,
                             key: String, orderCol: String): Unit = {
    val existing =
      try spark.read.parquet(snapshotPath)
      catch { case _: Throwable => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
    val merged = graft.operators.Dedup.keepLatestAgg(
      existing.unionByName(batch), Seq(key), Seq(col(orderCol)))
    // stage then swap: the read path above and overwrite below cannot
    // stream into each other
    val staged = snapshotPath + "__staging"
    merged.write.mode("overwrite").parquet(staged)
    val fs = new java.io.File(snapshotPath)
    if (fs.exists()) org.apache.commons.io.FileUtils.deleteDirectory(fs)
    new java.io.File(staged).renameTo(fs)
  }
}
