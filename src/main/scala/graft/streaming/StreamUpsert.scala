package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Upsert

/** Streaming trickle-upserts into a manifest table as MERGE-ON-READ delta
  * sidecars — the CDC-ingest shape at 100 TB. A change stream at a
  * 10-minute cadence must not pay a partition rewrite per micro-batch
  * (that is [[StreamStar]]'s job for the dimensional rebuild, and exactly
  * what [[graft.pipeline.Upsert.upsertKeysMor]] exists to avoid): each
  * batch lands as pre-merged per-partition sidecars in one atomic flip,
  * O(batch) written regardless of table size, and the table stays
  * readable mid-stream through every seam (pruned, indexed, as-of).
  *
  * Exactly-once: the micro-batch id rides the SAME manifest flip as the
  * sidecars (`mor_batch` ledger), so a restart that re-offers the last
  * batch skips it instead of re-applying — and even a pre-ledger replay
  * is harmless, because the sidecar pre-merge is keep-latest per key with
  * ties to the incoming rows: re-applying identical rows reproduces the
  * identical state ([[graft.MorUpsertSpec]]'s replay-idempotence pin).
  *
  * Compaction policy is the operator's lever, not this sink's: pending
  * sidecars accumulate one dir per (batch × partition) until a
  * [[graft.pipeline.Maintenance.compact]] pass (or any rewrite)
  * materializes them — the same small-file story as every trickle writer.
  */
object StreamUpsert {

  /** Wire an update stream into continuous MoR upserts of `tablePath`.
    * The default `AvailableNow` trigger drains what has landed and stops
    * (the cron-window analog); pass `ProcessingTime` for a resident
    * ingester. `updates` rows carry the table's full logical schema;
    * `keys`/`order` follow the table's frozen MoR contract.
    */
  def maintainMor(spark: SparkSession, updates: DataFrame, tablePath: String,
                  partCol: String, keys: Seq[String], order: Seq[String],
                  checkpoint: String,
                  committer: SnapshotCommitter = AtomicRenameCommitter,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val replayed = Upsert.tableMeta(tablePath, committer)
          .get("mor_batch").contains(id.toString)
        if (!replayed && !batch.isEmpty)
          Upsert.upsertKeysMor(spark, tablePath, partCol, keys, order, batch,
            committer, meta = Map("mor_batch" -> id.toString))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
