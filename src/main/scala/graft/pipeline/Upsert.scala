package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Partition-pruned incremental upsert — MERGE-into-partitioned-parquet
  * with copy-on-write granularity of ONE PARTITION, not one table.
  *
  * The reference rebuilds every model table as a full overwrite snapshot
  * on a 15-minute schedule (scheduler/README.md:688-692 semantics); that
  * is correct but rewrites the world. At 100 TB the incremental form is
  * mandatory: a delta batch touches a handful of day-partitions, so the
  * merge must (a) READ only the touched partitions — the `isin` partition
  * filter prunes the scan to them — (b) keep-latest per key across
  * existing ∪ delta via the same `max_by` aggregate as the W1 dedup, and
  * (c) WRITE only those partitions back, which is exactly Spark's dynamic
  * partition-overwrite mode (`spark.sql.sources.partitionOverwriteMode=
  * dynamic`): untouched partition directories are never listed, read, or
  * replaced. Work scales with the delta, not the table — the same
  * copy-on-write contract a Delta/Iceberg MERGE gives, expressed with
  * plain Spark + parquet.
  *
  * Ties between an existing row and a delta row with identical order keys
  * resolve to the DELTA row (a `__src` rank is appended to the max_by
  * order), so replaying the same batch is idempotent and an exact
  * re-send of a row with a bumped payload still lands.
  *
  * The merged frame is `localCheckpoint`ed before the write: it cuts the
  * lineage back to materialized partitions, which both avoids Spark's
  * read-overwrite-same-path rejection and bounds the write's input to the
  * touched-partition rows (in a multi-node deployment the same cut is a
  * staging write + atomic partition swap).
  *
  * `touched` is collected to the driver: it is the DISTINCT partition-key
  * list of one delta batch — bounded by the batch's day-span, not by data
  * volume.
  *
  * Atomicity caveat: dynamic partition overwrite commits per partition
  * directory — a crash mid-write can leave SOME touched partitions new and
  * others old (each individually consistent; untouched partitions are
  * never at risk, and re-running the same merge converges because ties go
  * to the delta). When cross-partition atomicity matters, use the
  * manifest-committed snapshot merge instead
  * ([[graft.streaming.StreamDedup.mergeBatchIntoSnapshot]]): immutable
  * batch dirs + one atomic pointer flip, crash-safe by construction.
  */
object Upsert {

  case class UpsertStats(touchedPartitions: Seq[String], deltaRows: Long,
                         mergedRows: Long)

  def upsertPartitions(spark: SparkSession, delta: DataFrame,
                       tablePath: String, partCol: String,
                       keys: Seq[String], order: Seq[String]): UpsertStats = {
    val touchedRaw = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(!touchedRaw.contains(null),
      s"delta has rows with null $partCol — a null partition key would " +
        "silently route rows to the __HIVE_DEFAULT_PARTITION__ directory")
    val touched = touchedRaw.sorted
    val existing = spark.read.parquet(tablePath)
      .filter(col(partCol).cast("string").isin(touched: _*))
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)))
    val merged = Dedup.keepLatestAgg(tagged, keys,
        (order.map(col) :+ col("__src")).toIndexedSeq)
      .drop("__src")
      .localCheckpoint(true)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tablePath)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    UpsertStats(touched, delta.count(), merged.count())
  }
}
