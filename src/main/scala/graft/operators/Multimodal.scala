package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north_star): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batch-shaped partition passes.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (fakeDecode) — what is real and tested
  * is the Spark-side shape: binary column + metadata struct schema, the
  * partition-batched execution (mapPartitions ≡ the Scala analog of
  * mapInPandas batches), and the bucket partitioning that keeps large blobs
  * from skewing tasks.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                           n_frames: Int, checksum: Long)

  /** Attach a synthetic binary media column (UTF-8 payload standing in for
    * image bytes) plus the typed metadata struct a real pipeline would carry
    * (content type, byte size, source).
    */
  def withMediaColumn(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("image/synthetic").as("content_type"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("origin")).as("media_meta"))

  /** STUB decode kernel: a real implementation would hand `bytes` to a codec
    * (JPEG/PNG/ffmpeg). This deterministic fake derives pseudo-dimensions
    * from a rolling checksum so the downstream plumbing is exercised with
    * stable values.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    var h = 1125899906842597L // deterministic FNV-ish fold, not a codec
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    val w = 64 + ((h % 960 + 960) % 960).toInt
    val ht = 64 + (((h >> 10) % 960 + 960) % 960).toInt
    val frames = 1 + (((h >> 20) % 16 + 16) % 16).toInt
    (w, ht, frames, h)
  }

  /** Batch feature extraction: one partition = one batch through the decode
    * kernel (the mapInPandas batch shape). Repartitions by a doc_id bucket
    * first so blob sizes spread evenly across tasks.
    */
  def extractFeatures(spark: SparkSession, documents: DataFrame,
                      buckets: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    withMediaColumn(documents)
      .repartition(buckets, pmod(col("doc_id"), lit(buckets)))
      .select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, frames, checksum) = fakeDecode(r.media)
          MediaFeatures(r.doc_id, r.media.length.toLong, w, h, frames, checksum)
        }
      }
  }

  /** Resize planning: target dimensions preserving aspect ratio, capped at
    * `maxSide` on the longer edge — the metadata half of a resize stage.
    * The pixel transform itself would run in the decode kernel; the
    * dimension math here is the real, exactly-testable part and is a pure
    * narrow projection (no kernel call, no shuffle).
    */
  def planResize(features: Dataset[MediaFeatures], maxSide: Int): DataFrame =
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1), round(col("width") * col("scale")).cast("int"))
          .as("target_width"),
        greatest(lit(1), round(col("height") * col("scale")).cast("int"))
          .as("target_height"))

  /** Frame-sampling work list: one row per sampled frame index (stride
    * `everyN`, always including frame 0) — the explode that fans a video
    * row out into per-frame decode tasks. At scale this is the partition
    * unit for the frame-decode stage: the generated (doc, frame) keys
    * repartition evenly regardless of per-video length skew.
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN)))
          .as("frame_idx"))

  /** Rollup over extracted features — the query surface the harness checks
    * (rows-only: the decode stub has no SQL oracle).
    */
  def mediaSummary(spark: SparkSession, documents: DataFrame): DataFrame =
    extractFeatures(spark, documents).toDF()
      .groupBy((col("n_frames") >= 8).as("long_form"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_width"),
        max(col("height")).as("max_height"))
}
