package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{AtomicRenameCommitter, SnapshotCommitter, VersionedCommitter}

/** Incremental materialized-view maintenance — the reference's scheduled
  * full rollup rebuilds (`scheduler/`: every table re-aggregated from
  * scratch each cycle) replaced by work proportional to the CHANGE: the
  * rollup advances by consuming the source table's version history and
  * re-aggregating ONLY the partitions the changes touched.
  *
  * Maintenance strategy is '''partial recompute''', not algebraic delta
  * application: the change feed names which `partCol` groups moved, those
  * source partitions are re-read (manifest-pruned — O(touched), never
  * O(table)) and re-aggregated, and the MV's matching partitions are
  * atomically replaced. Recompute handles EVERY aggregate — min/max and
  * count-distinct stay correct under deletes, where pure delta
  * application breaks (a deleted row can lower a max; the delta alone
  * cannot say to what). The cost model is the same as every partition
  * operator here: changed days, not table size.
  *
  * '''Exactly-once''': the source-version cursor (`__mvFrom`) rides the
  * MV's own manifest in the SAME atomic flip as the refreshed partitions
  * — the [[graft.streaming.TableTail]] ledger idea. Crash → replay the
  * identical diff → converge.
  *
  * '''Contract''' (shared with the upserts' key→partition rule):
  * `partCol` must be functionally dependent on the source key — a change
  * to a key must stay in its partition, else the feed's post-image names
  * only the NEW partition and the old one would silently keep its stale
  * aggregate. Derived-from-immutable columns (day from an event's ts)
  * satisfy this by construction.
  *
  * Composes with [[graft.plans.MaterializedViews]]: the maintained rollup
  * is exactly the shape `create` materializes, so a registered rewrite
  * can serve ad-hoc queries from a table this keeps fresh.
  */
object IncrementalMv {

  private val CursorKey = "__mvFrom"

  case class RefreshStats(fromVersion: Long, toVersion: Long,
                          touchedPartitions: Seq[String], applied: Boolean)

  /** The MV's committed source-version cursor (None = not bootstrapped). */
  def cursor(mvPath: String,
             committer: SnapshotCommitter = AtomicRenameCommitter): Option[Long] =
    committer.readManifest(mvPath).get(CursorKey).map(_.toLong)

  /** Advance the rollup at `mvPath` to the source's latest version.
    * `groups` must include `partCol`; `aggs` are the measure columns
    * (any aggregate — recompute, not delta math).
    */
  def refresh(spark: SparkSession, srcPath: String,
              srcCommitter: VersionedCommitter,
              mvPath: String, partCol: String,
              srcKeys: Seq[String],
              groups: Seq[String], aggs: Seq[Column],
              mvCommitter: SnapshotCommitter = AtomicRenameCommitter): RefreshStats = {
    require(groups.contains(partCol),
      s"the MV partition column $partCol must be one of its group columns")
    val versions = srcCommitter.versions(srcPath)
    require(versions.nonEmpty, s"no committed versions at $srcPath")
    val latest = versions.max

    def rollup(src: DataFrame): DataFrame =
      src.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)

    cursor(mvPath, mvCommitter) match {
      case None =>
        val full = rollup(Upsert.readTableAsOf(spark, srcPath, latest, srcCommitter))
        val parts = full.select(partCol).distinct().collect()
          .map(_.get(0).toString).toSeq
        Upsert.replacePartitionsAtomic(spark, full, mvPath, partCol, parts,
          mvCommitter, Map(CursorKey -> latest.toString))
        RefreshStats(-1L, latest, parts.sorted, applied = true)
      case Some(cur) if cur >= latest =>
        RefreshStats(cur, cur, Nil, applied = false)
      case Some(cur) =>
        // which rollup groups moved: the change feed's partition values
        // (post image for inserts/updates, pre image for deletes — under
        // the key→partition contract that IS the full touched set).
        // Discovery is log-first ([[Upsert.changedPartitionValues]]):
        // when every step has a servable write-time log, the set comes
        // from O(Σ change rows) of log reads with NO diff join — the
        // recompute below is then genuinely the only data work. A
        // union-of-steps SUPERSET (a net-reverted partition) only causes
        // a recompute that lands the same bytes, never a wrong rollup.
        val touched = Upsert.changedPartitionValues(spark, srcPath, cur,
          latest, srcKeys, partCol, srcCommitter)
        if (touched.isEmpty) {
          // version advanced with no data diff: advance the cursor alone,
          // atomically, replacing no partitions
          val head = Upsert.readTable(spark, mvPath, mvCommitter).limit(0)
          Upsert.replacePartitionsAtomic(spark, head, mvPath, partCol, Nil,
            mvCommitter, Map(CursorKey -> latest.toString))
          return RefreshStats(cur, latest, Nil, applied = true)
        }
        // partial recompute: ONLY the touched source partitions re-read
        // (manifest-pruned) and re-aggregated; a partition whose rows all
        // vanished re-aggregates empty and DROPS from the MV
        val srcHead = Upsert.readTablePartitions(spark, srcPath, touched,
          srcCommitter)
        Upsert.replacePartitionsAtomic(spark, rollup(srcHead), mvPath,
          partCol, touched, mvCommitter, Map(CursorKey -> latest.toString))
        RefreshStats(cur, latest, touched, applied = true)
    }
  }
}
