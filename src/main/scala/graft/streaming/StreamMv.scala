package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{IncrementalMv, Upsert}

/** CONTINUOUS materialized-view maintenance: a `foreachBatch` sink that,
  * per micro-batch, (1) merges the batch into the source manifest table
  * (keep-latest upsert — one new source version) and (2) advances the
  * rollup by [[graft.pipeline.IncrementalMv.refresh]] consuming exactly
  * that version's change feed — the Delta "streaming into a table +
  * incremental MV" composition on this engine's manifest seam. The MV is
  * continuously fresh at O(touched partitions) per batch; nothing ever
  * re-aggregates the whole source.
  *
  * Exactly-once by composition, no new machinery: the upsert is
  * keep-latest per key (a replayed micro-batch reproduces the identical
  * source state — a version advances, the data does not), and the MV's
  * `__mvFrom` cursor rides its own manifest flip, so the replayed
  * refresh sees an empty diff and advances the cursor alone. A crash
  * between the source commit and the MV commit re-runs the refresh from
  * the committed cursor and converges — the
  * [[graft.streaming.TableTail]] ledger argument, applied to the rollup.
  *
  * At 100 TB: per batch the source merge is O(batch ∩ partitions) and
  * the refresh re-aggregates only the partitions the change feed names —
  * the same cost model as the batch-mode MV, now on a streaming cadence.
  */
object StreamMv {

  /** One micro-batch: source upsert (skipped for an empty batch) + MV
    * catch-up. `groups` must include `partCol`; `keys`/`order` are the
    * source table's merge contract.
    */
  def upsertMvBatch(spark: SparkSession, batch: DataFrame,
                    srcPath: String, mvPath: String, partCol: String,
                    keys: Seq[String], order: Seq[String],
                    groups: Seq[String], aggs: Seq[Column],
                    srcCommitter: VersionedCommitter,
                    mvCommitter: SnapshotCommitter = AtomicRenameCommitter): IncrementalMv.RefreshStats = {
    if (!batch.isEmpty)
      Upsert.upsertPartitionsAtomic(spark, batch, srcPath, partCol, keys,
        order, srcCommitter)
    // an empty FIRST batch (Spark can deliver one on a fresh stream or a
    // checkpoint restart) leaves no committed source: refreshing would
    // throw and kill the streaming query — no source, nothing to refresh
    if (srcCommitter.versions(srcPath).isEmpty)
      IncrementalMv.RefreshStats(-1L, -1L, Nil, applied = false)
    else
      IncrementalMv.refresh(spark, srcPath, srcCommitter, mvPath, partCol,
        keys, groups, aggs, mvCommitter)
  }

  /** Wire a stream into continuous source + rollup maintenance. The
    * default `AvailableNow` trigger drains what has landed and stops (the
    * cron-window analog); pass `ProcessingTime` for a resident refresher.
    */
  def maintainMv(spark: SparkSession, rows: DataFrame,
                 srcPath: String, mvPath: String, partCol: String,
                 keys: Seq[String], order: Seq[String],
                 groups: Seq[String], aggs: Seq[Column],
                 checkpoint: String,
                 srcCommitter: VersionedCommitter,
                 mvCommitter: SnapshotCommitter = AtomicRenameCommitter,
                 trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertMvBatch(spark, batch, srcPath, mvPath, partCol, keys, order,
          groups, aggs, srcCommitter, mvCommitter)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
