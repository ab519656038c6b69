package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.pipeline.Upsert

/** Commit tailing — a downstream table that advances by consuming the
  * upstream's version history, the Delta/Iceberg `readStream`-on-a-table
  * idea on this engine's manifest seam. A replica (cross-region copy,
  * downstream mart, derived serving table) never re-reads the source
  * snapshot: each cycle diffs the source between the replica's CURSOR
  * version and the source's latest ([[Upsert.tableChanges]] — work
  * O(changed keys)), merges the feed partition-granularly
  * ([[Upsert.applyChanges]] — work O(touched partitions)), and commits.
  *
  * '''Exactly-once without a transaction coordinator''': the cursor is a
  * metadata entry (`__tailFrom`) in the REPLICA's own manifest, committed
  * in the SAME atomic flip as the data it describes. A crash anywhere
  * before the flip leaves cursor and data at the previous consistent pair
  * (the orphaned staging is GC'd); re-running `replicate` recomputes the
  * identical diff and converges — replay is idempotent because the merge
  * is a pure function of (replica state, source diff). A cycle that finds
  * the cursor current is a no-op (no commit, no version churn).
  *
  * At 100 TB the cycle cost tracks the CHANGE volume, not the table:
  * `tableChanges` reads two as-of states today (sound, O(table) I/O at
  * the extremes) but its output — and everything downstream — is the
  * changed keys; swapping the diff for a stored per-commit changelog
  * would make the read side O(delta) too without touching this
  * consumer's contract. The bootstrap (first call) is necessarily a full
  * copy of the source's latest version; pass `bootstrapAt` to seed from
  * an earlier version (history willing) and exercise pure catch-up.
  */
object TableTail {

  private val CursorKey = "__tailFrom"

  /** One replication cycle's outcome: versions before/after, whether a
    * commit happened.
    */
  case class TailStats(fromVersion: Long, toVersion: Long, applied: Boolean)

  /** The replica's committed cursor (None = not bootstrapped). */
  def cursor(replicaPath: String,
             committer: SnapshotCommitter = AtomicRenameCommitter): Option[Long] =
    committer.readManifest(replicaPath).get(CursorKey).map(_.toLong)

  /** Advance `replicaPath` to the source's latest version: bootstrap on
    * first call, CDF catch-up after. `partCol`/`keys`/`order` are the
    * source table's merge contract (same as its own upserts).
    */
  def replicate(spark: SparkSession, srcPath: String,
                srcCommitter: VersionedCommitter,
                replicaPath: String, partCol: String,
                keys: Seq[String], order: Seq[String],
                replicaCommitter: SnapshotCommitter = AtomicRenameCommitter,
                bootstrapAt: Option[Long] = None): TailStats = {
    val versions = srcCommitter.versions(srcPath)
    require(versions.nonEmpty, s"no committed versions at $srcPath")
    val latest = versions.max
    cursor(replicaPath, replicaCommitter) match {
      case None =>
        val at = bootstrapAt.getOrElse(latest)
        require(versions.contains(at),
          s"bootstrap version $at not in retained history ${versions.mkString(",")}")
        val state = Upsert.readTableAsOf(spark, srcPath, at, srcCommitter)
        // distinct partition values: bounded by the table's partition
        // count, the same O(partitions) driver list every commit carries
        val parts = state.select(partCol).distinct().collect()
          .map(_.get(0).toString).toSeq
        Upsert.replacePartitionsAtomic(spark, state, replicaPath, partCol,
          parts, replicaCommitter, Map(CursorKey -> at.toString))
        TailStats(-1L, at, applied = true)
      case Some(cur) if cur >= latest =>
        TailStats(cur, cur, applied = false)
      case Some(cur) =>
        // stepwise logged catch-up: when every step in the span has a
        // servable write-time log (enableChangeFeed), apply the feeds
        // version by version — O(Σ change rows) read, NO diff join, and
        // each step commits its own cursor, so a crash mid-catch-up
        // resumes from the last applied version instead of replaying the
        // whole span. Spans past maxLoggedSteps are COST-COMPARED rather
        // than unconditionally netted: a long trickle backlog of tiny
        // per-step logs (footer-proved Σ change rows) can be far cheaper
        // than the netted diff's read of every changed partition at both
        // endpoint versions (committed `__rows` stamps) — both estimates
        // are metadata-only. When either side can't be proved, the
        // bounded default stands (short span stepwise, long span netted —
        // per-step replica version churn is only worth provable savings).
        val span = latest - cur
        val preferStepwise = span <= maxLoggedSteps || {
          (Upsert.loggedChangeRowEstimate(spark, srcPath, cur, latest, srcCommitter),
            Upsert.nettedDiffReadEstimate(srcPath, cur, latest, srcCommitter)) match {
            case (Some(logged), Some(netted)) => logged <= netted
            case _ => false
          }
        }
        val stepFeeds =
          if (!preferStepwise) None
          else {
            val feeds = ((cur + 1) to latest).map(v =>
              v -> Upsert.tableChangesLogged(spark, srcPath, v, keys, srcCommitter))
            if (feeds.forall(_._2.isDefined))
              Some(feeds.map { case (v, f) => v -> f.get })
            else None
          }
        stepFeeds match {
          case Some(feeds) =>
            feeds.foreach { case (v, feed) =>
              Upsert.applyChanges(spark, feed, replicaPath, partCol, keys,
                order, replicaCommitter, Map(CursorKey -> v.toString))
            }
          case None =>
            // netted pruned diff: one join over the changed partitions,
            // one replica commit
            val changes = Upsert.tableChanges(spark, srcPath, cur, latest,
              keys, srcCommitter)
            Upsert.applyChanges(spark, changes, replicaPath, partCol, keys,
              order, replicaCommitter, Map(CursorKey -> latest.toString))
        }
        TailStats(cur, latest, applied = true)
    }
  }

  /** Catch-up spans up to this length take the stepwise path whenever
    * the logs are servable, no cost proof needed; longer spans must
    * PROVE the read saving (see the cost comparison in [[replicate]]) —
    * N per-step replica commits churn the replica's retained history,
    * which is only worth a demonstrated win over one netted merge.
    */
  private val maxLoggedSteps = 16L
}
