package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.DedupIndex
import graft.pipeline.Curation

/** CONTINUOUS CORPUS CURATION — the streaming form of
  * [[Curation.admitBatch]]: documents arrive as a file stream in
  * MONOTONE-doc_id micro-batches (the natural crawl-ingest order), and
  * each batch is curated against everything admitted so far without ever
  * recomputing the corpus:
  *
  *  - exact dedup within the batch, then the Bloom-routed verification
  *    join against the committed exact survivors;
  *  - near-dup via [[DedupIndex.probeDelta]] against the persisted
  *    prefix index (exact prefix-filter candidates — the equivalence to
  *    whole-corpus curation is deterministic, not LSH-probabilistic);
  *  - the identical quality gate + enrichment;
  *  - the batch's exact survivors extend the index
  *    ([[DedupIndex.appendToIndex]]) and the exact-survivor table, so
  *    the NEXT micro-batch sees this one as corpus.
  *
  * Same equivalence as the batch-incremental form: with ids ordered
  * across batches, `seed curation ∪ admitted batches ≡ whole-corpus
  * curation` exactly (the `stream_curation` CORRECTNESS row shares the
  * whole-corpus oracle). Per-batch cost is O(batch + candidates) pair
  * work plus one narrow scan of the exact-survivor table (the Bloom
  * build side — a production deployment persists the bloom sidecar
  * instead of rebuilding it; the pair volume, which is the term that
  * explodes at scale, never exceeds the batch's candidate set).
  *
  * Delivery semantics: the curated/exact tables are keyed by doc_id and
  * written via idempotent parquet appends gated by a BATCH-ID LEDGER
  * (`foreachBatch` replays carry the same batchId, so a fully-committed
  * batch is skipped whole — the StreamStar exactly-once device). The
  * residual window is a crash BETWEEN the appends and the ledger stamp:
  * a replay then re-appends (duplicate curated rows, duplicate index
  * postings). Closing that window end-to-end means committing all three
  * writes through one manifest flip — the [[graft.pipeline.Upsert]]
  * machinery this repo already has — at the cost of making the dedup
  * index a manifest table; the demo keeps the plain bucket-partitioned
  * index layout and documents the trade.
  */
object StreamCuration {

  private val OutCols = Seq("doc_id", "text", "quality_score",
    "predicted_lang", "n_tokens")

  /** Start the continuous admission over `docStream` (schema of the
    * `documents` table). `outDir` must already hold `exact/` (the seed's
    * exact survivors) and the index at `indexPath` built on them;
    * admitted rows land under `outDir/curated`.
    */
  def maintainCuration(spark: SparkSession, docStream: DataFrame,
                       indexPath: String, outDir: String,
                       checkpoint: String,
                       jaccardThreshold: Double = 0.8,
                       minQuality: Double = 0.3): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ledger = s"$outDir/_ledger/$batchId"
        if (!TableFs.exists(ledger) && !batch.isEmpty) {
          val seedExact = spark.read.parquet(s"$outDir/exact")
          val (admitted, batchExact) = Curation.admitBatch(spark,
            seedExact, indexPath, batch, jaccardThreshold, minQuality)
          admitted.select(OutCols.map(col): _*)
            .write.mode("append").parquet(s"$outDir/curated")
          DedupIndex.appendToIndex(batchExact, indexPath)
          batchExact.write.mode("append").parquet(s"$outDir/exact")
          TableFs.writeAtomic(s"$outDir/_ledger", batchId.toString, "done\n")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stage `docs` under `dir` as `numBatches` MONOTONE-doc_id parquet
    * files with strictly increasing modification times, so a
    * `maxFilesPerTrigger = 1` file stream delivers them as ordered
    * micro-batches — the determinism the admission's drop-the-higher-id
    * rule needs. (A live ingest satisfies this naturally: files land in
    * arrival order with monotone ids.)
    */
  def stageMonotoneBatches(spark: SparkSession, docs: DataFrame,
                           dir: String, numBatches: Int): Unit = {
    val ids = docs.select(col("doc_id")).agg(
      min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val step = math.max(1L, (hi - lo + numBatches) / numBatches)
    (0 until numBatches).foreach { i =>
      val slice = docs.filter(col("doc_id") >= lo + i * step &&
        col("doc_id") < lo + (i + 1).toLong * step)
      val tmp = s"$dir/_stage-$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = TableFs.list(tmp)
        .filter(_.getPath.getName.endsWith(".parquet")).head
      TableFs.renameOverwrite(s"$tmp/${part.getPath.getName}",
        s"$dir/batch-$i.parquet")
      TableFs.delete(tmp)
      // strictly increasing mtimes: FileStreamSource orders candidate
      // files by timestamp, and equal stamps would let one trigger glue
      // two batches together (or reorder them)
      val f = TableFs.localFile(s"$dir/batch-$i.parquet")
      f.setLastModified(
        System.currentTimeMillis() - (numBatches - i).toLong * 60000L)
      ()
    }
  }
}
