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

  /** Gap-based session aggregation via the NATIVE `session_window` function
    * — the idiomatic Spark form of sessionization when per-session
    * aggregates are all that's needed (state merging, watermark eviction
    * and out-of-order handling come from the engine; reserve
    * [[Stateful.streamingSessions]] for bespoke per-session semantics a
    * built-in aggregate can't express). Works over batch and streaming
    * input alike; in streaming, append mode emits a session once the
    * watermark passes its close. `session_window.end` is last-event + gap,
    * so `session_end_us` here is the batch operator's `max(ts)` + gap.
    */
  def sessionCounts(events: DataFrame, gapMinutes: Int = 30,
                    watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Streaming form of the run-log daily monitoring rollup: the same
    * nested-field extraction + success band as the batch view
    * (Monitoring.dailySummaryFromRunLog), expressed over a file-discovered
    * log stream with a watermarked 1-day tumbling window. The watermark
    * bounds per-job aggregation state to (open windows × jobs); late log
    * records inside the delay still land in their day.
    */
  def streamingRunLogDailySummary(runLogStream: DataFrame,
                                  watermarkDelay: String = "1 hour"): DataFrame =
    runLogStream
      .select(
        col("timestamp"),
        col("resource.labels.job_id").as("job_name"),
        expr("try_cast(httpRequest.status AS BIGINT)").as("status"))
      .filter(col("status").isNotNull)
      .withColumn("is_success", col("status").between(200, 299))
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), "1 day"), col("job_name"))
      .agg(
        count(lit(1)).as("total_runs"),
        sum(when(col("is_success"), 1L).otherwise(0L)).as("success_runs"))
      .select(col("window.start").cast("date").as("event_date"), col("job_name"),
        col("total_runs"), col("success_runs"))

  /** foreachBatch MERGE analog (SURVEY.md §2.9 "streaming: dropDuplicates…
    * or foreachBatch + MERGE"): each micro-batch is merged into a
    * day-partitioned parquet snapshot by key — existing rows are replaced
    * by newer versions, keep-latest per key. This is the upsert shape for
    * sinks without native MERGE; on a table format with MERGE INTO the same
    * foreachBatch body becomes one SQL statement.
    *
    * Rewrites are bounded to the day partitions the batch touches (plus the
    * previous day, because the replication lookback is shorter than a day,
    * so a superseded version of a key can sit at most one partition behind
    * its replacement). Untouched days are never read or rewritten — per
    * batch the I/O is O(touched days), not O(snapshot), which is the
    * difference between a merge and a full-table rewrite on a growing
    * 100 TB snapshot. The dynamic-partition-overwrite is explicit
    * (stage → per-day swap) because a path-based parquet overwrite cannot
    * read from the path it is replacing.
    *
    * Crash safety: each day's swap parks the previous data in a sibling
    * `__old` dir, moves the staged day in, then deletes the parked copy —
    * at every instant the day's data exists under exactly one location, and
    * the next batch auto-restores a parked day whose move-in never completed
    * (a delete-then-move window would lose the day outright). Swap
    * atomicity relies on local-filesystem `rename` (java.io); on an object
    * store this body should become the table format's MERGE/commit instead.
    */
  def mergeBatchIntoSnapshot(spark: org.apache.spark.sql.SparkSession,
                             batch: DataFrame, snapshotPath: String,
                             key: String, orderCol: String): Unit = {
    val dayFmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
    val withDay = batch.withColumn("snap_day", date_format(col(orderCol), "yyyyMMdd"))
    // partition METADATA, not data: one value per day present in the batch
    val batchDays = withDay.select("snap_day").distinct()
      .collect().map(_.getString(0))
    val readDays = (batchDays ++ batchDays.map(d =>
      java.time.LocalDate.parse(d, dayFmt).minusDays(1).format(dayFmt)))
      .distinct.sorted

    val snapDir = new java.io.File(snapshotPath)
    val oldRoot = new java.io.File(snapshotPath + "__old")
    def rmIfExists(d: java.io.File): Unit =
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    // crash recovery BEFORE the snapshot read: a prior run may have parked a
    // day (moved aside, move-in never completed) — restore it now so the
    // merge below reads it; a parked day whose move-in DID complete is a
    // stale leftover and is dropped. Recovering here (not inside the swap
    // loop) is load-bearing: the merge must see the restored data.
    for (d <- Option(oldRoot.listFiles()).getOrElse(Array.empty[java.io.File])) {
      val dst = new java.io.File(snapDir, d.getName)
      if (!dst.exists()) org.apache.commons.io.FileUtils.moveDirectory(d, dst)
      else org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    val existing =
      if (snapDir.exists())
        spark.read.schema(withDay.schema).parquet(snapshotPath)
          .filter(col("snap_day").isin(readDays.toSeq: _*)) // PartitionFilter
      else withDay.limit(0)
    val merged = graft.operators.Dedup.keepLatestAgg(
      existing.unionByName(withDay), Seq(key), Seq(col(orderCol)))

    val staged = snapshotPath + "__staging"
    merged.write.mode("overwrite").partitionBy("snap_day").parquet(staged)
    val stagedDir = new java.io.File(staged)
    snapDir.mkdirs()
    // move-aside swap: the day's previous data parks in a SIBLING dir (never
    // inside the snapshot root, where readers would see it as a partition),
    // so at every instant each day exists under exactly one of dst/old
    oldRoot.mkdirs()
    for (day <- readDays) {
      val src = new java.io.File(stagedDir, s"snap_day=$day")
      val dst = new java.io.File(snapDir, s"snap_day=$day")
      val old = new java.io.File(oldRoot, s"snap_day=$day")
      if (src.exists()) {
        if (dst.exists()) org.apache.commons.io.FileUtils.moveDirectory(dst, old)
        org.apache.commons.io.FileUtils.moveDirectory(src, dst)
        rmIfExists(old)
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(stagedDir)
    rmIfExists(oldRoot)
  }
}
