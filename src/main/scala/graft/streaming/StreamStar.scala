package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Dims, Star}
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

  /** One micro-batch of the continuous refresh: dims absorb the batch
    * (incremental mode) → fact merge → touched-day star replace.
    * Idempotent under micro-batch replay.
    *
    * `incrementalDims = false` (default): dims are FULLY REBUILT from the
    * merged fact each batch — always correct, O(fact) per cycle, the
    * reference's own CTAS cadence. `incrementalDims = true`: dims absorb
    * only the batch's genuinely-new rows via the mergeable forms
    * ([[Dims.mergeDimUser]] family) — O(dim + batch) per cycle,
    * independent of fact size, which is what survives a 100 TB fact at a
    * 15-minute cadence. Exactly-once under replay comes from a per-table
    * batch-id LEDGER riding each dim's atomic manifest commit
    * ([[Upsert.writeTableAtomic]] `meta`): dims are updated BEFORE the
    * fact merge (so insert-extraction against the pre-merge fact is
    * reproducible on replay), and a replayed batch id skips exactly the
    * dim tables that already committed it — a crash between any two
    * commits resumes without double-counting. Requires `batchId`
    * (foreachBatch provides it); the first batch seeds dims by full
    * rebuild.
    */
  def upsertStarBatch(spark: SparkSession, batch: DataFrame,
                      root: String,
                      committer: SnapshotCommitter = AtomicRenameCommitter,
                      batchId: Option[Long] = None,
                      incrementalDims: Boolean = false): Unit = {
    val p = StarPaths(root)
    // ALL THREE dims must be committed before the incremental path engages:
    // a crash mid-SEED (some dims committed, some not) must replay down the
    // full-rebuild path, which overwrites the partial seed correctly —
    // absorb-into-a-missing-dim would fail instead
    val dimsExist = Seq(p.dimUser, p.dimEventType, p.dimDate)
      .forall(committer.readManifest(_).nonEmpty)
    val incremental = incrementalDims && dimsExist
    if (incrementalDims)
      require(batchId.isDefined,
        "incrementalDims needs a batchId for the exactly-once ledger")
    if (incremental)
      absorbBatchIntoDims(spark, batch, p, batchId.get, committer)

    val readDays = StreamDedup.mergeBatchIntoSnapshot(spark, batch,
      p.factSnap, "event_id", "ts", committer)
    if (readDays.isEmpty) return

    val fact = StreamDedup.readSnapshot(spark, p.factSnap, committer)
    // dims (full-rebuild mode or first-batch seed): whole-rebuild
    // snapshots through the SAME manifest protocol as the fact and star —
    // a crash mid-dim-write leaves the previous committed dim in force
    // (plain SaveMode.Overwrite is delete-then-write: a crash in that
    // window leaves NO readable dim), so every table in the DAG carries
    // the commit guarantee, not just the big two
    if (!incremental) {
      val meta = batchId.map(id => Map("batch" -> id.toString)).getOrElse(Map.empty)
      Upsert.writeTableAtomic(spark, Dims.dimUser(fact), p.dimUser, committer, meta)
      Upsert.writeTableAtomic(spark, Dims.dimEventType(fact), p.dimEventType, committer, meta)
      Upsert.writeTableAtomic(spark, Dims.dimDate(fact), p.dimDate, committer, meta)
    }

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

  /** Incremental dim maintenance for one micro-batch, BEFORE the fact
    * merge: extract the batch's genuinely-new rows (in-batch keep-latest,
    * then anti-join against the PRE-merge committed fact restricted to the
    * batch's home days — an event's home day is `day(ts)`, so that scope
    * is exact), and absorb them into each dim via its mergeable form. Each
    * dim commits the batch id in its own manifest ledger; a replayed id
    * skips exactly the tables that already applied it.
    */
  private def absorbBatchIntoDims(spark: SparkSession, batch: DataFrame,
                                  p: StarPaths, batchId: Long,
                                  committer: SnapshotCommitter): Unit = {
    val factManifest = committer.readManifest(p.factSnap)
    val days = batch.select(date_format(col("ts"), "yyyyMMdd").as("d"))
      .distinct().collect().map(_.getString(0)).toSeq
    val oldPaths = days.flatMap(factManifest.get)
      .map(rel => s"${p.factSnap}/$rel")
    val oldIds =
      if (oldPaths.nonEmpty) spark.read.parquet(oldPaths: _*).select("event_id")
      else batch.select("event_id").limit(0)
    val newEvents = Dedup.keepLatestAgg(batch, Seq("event_id"), Seq(col("ts")))
      .join(oldIds, Seq("event_id"), "left_anti")

    val ledger = Map("batch" -> batchId.toString)
    def stale(path: String): Boolean =
      !Upsert.tableMeta(path, committer).get("batch").contains(batchId.toString)
    if (stale(p.dimUser))
      Upsert.writeTableAtomic(spark,
        Dims.mergeDimUser(Upsert.readTable(spark, p.dimUser, committer), newEvents),
        p.dimUser, committer, ledger)
    if (stale(p.dimEventType))
      Upsert.writeTableAtomic(spark,
        Dims.mergeDimEventType(Upsert.readTable(spark, p.dimEventType, committer), newEvents),
        p.dimEventType, committer, ledger)
    if (stale(p.dimDate))
      Upsert.writeTableAtomic(spark,
        Dims.mergeDimDate(Upsert.readTable(spark, p.dimDate, committer), newEvents),
        p.dimDate, committer, ledger)
  }

  /** Wire an events stream into the continuous star refresh. The default
    * `AvailableNow` trigger drains what has landed and stops — the
    * cron-window analog; pass `ProcessingTime` for a resident refresher.
    */
  def maintainStar(spark: SparkSession, events: DataFrame, root: String,
                   checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   incrementalDims: Boolean = false): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertStarBatch(spark, batch, root, batchId = Some(id),
          incrementalDims = incrementalDims)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
