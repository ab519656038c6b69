package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dims, Star}
import graft.pipeline.Upsert

/** The reference's scheduled refresh DAG (land → fact → dims → star,
  * reference README.md:688-692, 15-min/hourly cadence) as ONE continuous
  * streaming program: a `foreachBatch` sink that, per micro-batch,
  *
  *  1. merges the batch into the keep-latest FACT snapshot
  *     ([[StreamDedup.mergeBatchIntoSnapshot]] — manifest-committed,
  *     O(touched days) I/O);
  *  2. rebuilds the DIMS as whole-table snapshots from the merged fact —
  *     the reference's own CTAS-per-cycle shape for its latest-only dims
  *     (every dim aggregate here is min/max/count: map-side-combining,
  *     one shuffle of O(distinct keys)) — through the same manifest
  *     protocol ([[Upsert.writeTableAtomic]]), so a crash mid-dim-write
  *     leaves the previous committed dim readable; dims land ON DISK
  *     before the star reads them, preserving the materialized-inputs
  *     plan shape that keeps the star's joins AQE-skew-splittable
  *     ([[graft.pipeline.Pipeline.starFromMaterialized]] scaladoc);
  *  3. rebuilds ONLY the touched days of the star — the day set the fact
  *     merge read (batch days + predecessors) is re-derived from the
  *     merged fact and atomically REPLACES those `date_key` partitions
  *     ([[Upsert.replacePartitionsAtomic]]): per batch the star work is
  *     O(touched days), not O(star), and a crash anywhere leaves the
  *     previous committed star in force.
  *
  * Late/duplicate tolerance comes from the fact merge (keep-latest with
  * previous-day read), and end-state equivalence with the batch pipeline
  * — `Pipeline.run`'s star over the same events — is pinned by
  * `StreamStarSpec`, including a checkpoint-restart replay. Exactly-once
  * visibility: a replayed micro-batch (restart after a crash between the
  * fact commit and the star commit) re-runs steps 1-3 idempotently —
  * merge ties go to the delta and the star replace is a pure function of
  * the merged fact, so re-execution converges.
  *
  * At 100 TB: step 1 and 3 scale with the delta; step 2 scales with
  * distinct dim keys (users), the one O(corpus) aggregate — the same cost
  * the reference pays per cycle. When users outgrow that, the dims move
  * to the same keyed incremental merge as the fact (min/max/count are all
  * mergeable); kept snapshot-shaped here to mirror the reference.
  */
object StreamStar {

  /** Canonical layout under one root. */
  case class StarPaths(root: String) {
    val factSnap: String = s"$root/fact_snap"
    val dimUser: String = s"$root/dim_user"
    val dimEventType: String = s"$root/dim_event_type"
    val dimDate: String = s"$root/dim_date"
    val star: String = s"$root/fact_events_star"
  }

  /** One micro-batch of the continuous refresh: fact merge → dims CTAS →
    * touched-day star replace. Idempotent under micro-batch replay.
    */
  def upsertStarBatch(spark: SparkSession, batch: DataFrame,
                      root: String,
                      committer: SnapshotCommitter = AtomicRenameCommitter): Unit = {
    val p = StarPaths(root)
    val readDays = StreamDedup.mergeBatchIntoSnapshot(spark, batch,
      p.factSnap, "event_id", "ts", committer)
    if (readDays.isEmpty) return

    val fact = StreamDedup.readSnapshot(spark, p.factSnap, committer)
    // dims: whole-rebuild snapshots through the SAME manifest protocol as
    // the fact and star — a crash mid-dim-write leaves the previous
    // committed dim in force (plain SaveMode.Overwrite is delete-then-
    // write: a crash in that window leaves NO readable dim), so every
    // table in the DAG carries the commit guarantee, not just the big two
    Upsert.writeTableAtomic(spark, Dims.dimUser(fact), p.dimUser, committer)
    Upsert.writeTableAtomic(spark, Dims.dimEventType(fact), p.dimEventType, committer)
    Upsert.writeTableAtomic(spark, Dims.dimDate(fact), p.dimDate, committer)

    // star delta: the touched days of the MERGED fact (snap_day prunes the
    // manifest read scope on the Spark side too), joined through the
    // on-disk dims — then an atomic replace of exactly those partitions.
    // `readDays` (not just days with surviving rows) is the replace set,
    // so a day whose rows all moved forward is dropped, not left stale.
    val factTouched = fact.filter(col("snap_day").isin(readDays: _*))
      .drop("snap_day")
    val starDelta = Star.factStar(
      factTouched,
      Upsert.readTable(spark, p.dimUser, committer),
      Upsert.readTable(spark, p.dimEventType, committer),
      Upsert.readTable(spark, p.dimDate, committer))
    Upsert.replacePartitionsAtomic(spark, starDelta, p.star, "date_key",
      readDays, committer)
  }

  /** Wire an events stream into the continuous star refresh. The default
    * `AvailableNow` trigger drains what has landed and stops — the
    * cron-window analog; pass `ProcessingTime` for a resident refresher.
    */
  def maintainStar(spark: SparkSession, events: DataFrame, root: String,
                   checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertStarBatch(spark, batch, root)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
