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
}
