package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north_star): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batch-shaped partition passes.
  *
  * Header-level metadata extraction is REAL: [[parseImageHeader]] reads
  * PNG/GIF/JPEG dimensions straight from the container byte layout (no
  * codec library), so format/width/height/resize-planning run production
  * paths. Only PIXEL decoding needs a codec the container lacks — that one
  * kernel is a clearly-marked deterministic STUB (fakeDecode), reached only
  * for non-image payloads. Also real and tested: the binary column +
  * metadata struct schema, the partition-batched execution (mapPartitions ≡
  * the Scala analog of mapInPandas batches), and the bucket partitioning
  * that keeps large blobs from skewing tasks.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int, checksum: Long)

  /** REAL header-level image metadata — no codec library involved, just the
    * container formats' own byte layout:
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian width/height
    *    at offsets 16/20;
    *  - GIF87a/89a: little-endian logical-screen width/height at 6/8;
    *  - JPEG: marker scan from SOI to the first SOF0-SOF15 frame header
    *    (skipping DHT/DAC/RST markers), big-endian height/width at +5/+7.
    * Returns (format, width, height); None when the bytes are not a
    * recognized image — the caller falls back to the stub. Dimension
    * extraction is the production-real half of "decode"; only pixel work
    * needs the codec the container lacks.
    */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
      u8(3) == 'G' && u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
      u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some(("jpeg", be16(i + 7), be16(i + 5)))
        else if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
        else i += 2 + be16(i + 2) // segment length includes itself
      }
      None
    } else None
  }

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

  case class AudioFeatures(doc_id: Long, format: String, sample_rate: Int,
                           channels: Int, bits_per_sample: Int, n_samples: Long,
                           duration_ms: Long)

  /** REAL WAV (RIFF) metadata — little-endian chunk scan, no codec: the
    * `fmt ` chunk carries channels/sample-rate/bits, the `data` chunk's size
    * gives the sample count (and with the rate, the duration). Returns
    * (sampleRate, channels, bitsPerSample, nSamples); None when the bytes
    * are not RIFF/WAVE.
    */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => u8(i + k) == s.charAt(k))
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var rate = 0; var channels = 0; var bits = 0; var dataBytes = -1L
    while (i + 8 <= b.length && (rate == 0 || dataBytes < 0)) {
      val size = le32(i + 4)
      if (tag(i, "fmt ") && i + 24 <= b.length) {
        channels = le16(i + 10); rate = le32(i + 12).toInt; bits = le16(i + 22)
      } else if (tag(i, "data")) dataBytes = size
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataBytes < 0) None
    else Some((rate, channels, bits, dataBytes / (channels * (bits / 8))))
  }

  /** REAL MP4/QuickTime metadata — ISO-BMFF box scan, no codec: top-level
    * boxes are `[size:4][type:4]`; the `moov` container's `mvhd` child
    * carries the movie timescale and duration (version 0: 32-bit at +12/+16
    * past the box header; version 1: 64-bit times). Returns duration in
    * milliseconds; None when the bytes are not an MP4 or `mvhd` is absent.
    */
  def parseMp4Duration(b: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => u8(i + k) == s.charAt(k))
    if (b.length < 16 || !tag(4, "ftyp")) return None
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(i)
      if (tag(i + 4, "moov")) {
        var j = i + 8
        val end = math.min(i + size, b.length.toLong).toInt
        while (j + 8 <= end) {
          val csize = be32(j)
          if (tag(j + 4, "mvhd") && j + 28 <= end) {
            // v0: creation(4) modification(4) timescale(4)@+20 duration(4)@+24
            // v1: creation(8) modification(8) timescale(4)@+28 duration(8)@+32
            val version = u8(j + 8)
            return if (version == 1 && j + 40 <= end)
              Some(be64(j + 32) * 1000L / be32(j + 28))
            else
              Some(be32(j + 24) * 1000L / be32(j + 20))
          }
          if (csize < 8) return None
          j += csize.toInt
        }
        return None
      }
      if (size < 8) return None
      i += size.toInt
    }
    None
  }

  case class TrackInfo(track_id: Long, handler: String, width: Int, height: Int)
  case class TrackRow(doc_id: Long, track_id: Long, handler: String,
                      width: Int, height: Int)

  /** REAL MP4/QuickTime TRACK-level metadata — walks `moov`'s `trak`
    * children: `tkhd` carries the track id and the 16.16 fixed-point
    * presentation width/height (nonzero only for visual tracks), and
    * `mdia`/`hdlr` carries the handler four-cc (`vide`, `soun`, ...). Pure
    * ISO-BMFF box arithmetic, no codec — the per-stream metadata a video
    * curation pipeline filters on (drop audio-only files, cap resolutions,
    * route tracks to the right decode kernel).
    */
  def parseMp4Tracks(b: Array[Byte]): Seq[TrackInfo] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => u8(i + k) == s.charAt(k))
    // visit each child box start in [start, end); stops on a corrupt size
    def children(start: Int, end: Int)(f: Int => Unit): Unit = {
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val size = be32(i)
        if (size < 8) ok = false
        else { f(i); i += size.toInt }
      }
    }
    if (b.length < 16 || !tag(4, "ftyp")) return Nil
    val out = Seq.newBuilder[TrackInfo]
    children(0, b.length) { i =>
      if (tag(i + 4, "moov")) {
        val moovEnd = math.min(i + be32(i), b.length.toLong).toInt
        children(i + 8, moovEnd) { t =>
          if (tag(t + 4, "trak")) {
            val trakEnd = math.min(t + be32(t), moovEnd.toLong).toInt
            var trackId = -1L; var w = 0; var h = 0; var handler = "unkn"
            children(t + 8, trakEnd) { c =>
              if (tag(c + 4, "tkhd")) {
                val v = u8(c + 8)
                // v0: id@+20, 16.16 width/height @+84/+88 (92-byte box);
                // v1: 64-bit times push id to +28, width/height to +96/+100
                if (v == 1 && c + 104 <= trakEnd) {
                  trackId = be32(c + 28)
                  w = (be32(c + 96) >> 16).toInt; h = (be32(c + 100) >> 16).toInt
                } else if (v == 0 && c + 92 <= trakEnd) {
                  trackId = be32(c + 20)
                  w = (be32(c + 84) >> 16).toInt; h = (be32(c + 88) >> 16).toInt
                }
              } else if (tag(c + 4, "mdia")) {
                val mdiaEnd = math.min(c + be32(c), trakEnd.toLong).toInt
                children(c + 8, mdiaEnd) { m =>
                  if (tag(m + 4, "hdlr") && m + 20 <= mdiaEnd)
                    handler = new String(b.slice(m + 16, m + 20), "ISO-8859-1")
                }
              }
            }
            if (trackId >= 0) out += TrackInfo(trackId, handler, w, h)
          }
        }
      }
    }
    out.result()
  }

  /** Track extraction over a `(doc_id, media: binary)` column — one output
    * row per MP4 track (video tracks carry real dimensions); non-MP4
    * payloads produce no rows. Same bucketed mapPartitions batch shape as
    * the other kernels.
    */
  def extractVideoTracks(spark: SparkSession, media: DataFrame,
                         buckets: Int = 32): Dataset[TrackRow] = {
    import spark.implicits._
    media
      .repartition(buckets, pmod(col("doc_id"), lit(buckets)))
      .select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          parseMp4Tracks(r.media).map(t =>
            TrackRow(r.doc_id, t.track_id, t.handler, t.width, t.height))
        }
      }
  }

  /** Audio metadata extraction over a `(doc_id, media: binary)` column —
    * real WAV headers get real sample counts/durations; non-audio payloads
    * are tagged `unknown` with zeroed metrics (a codec-backed kernel would
    * handle compressed formats).
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame,
                           buckets: Int = 32): Dataset[AudioFeatures] = {
    import spark.implicits._
    media
      .repartition(buckets, pmod(col("doc_id"), lit(buckets)))
      .select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          parseWavHeader(r.media) match {
            case Some((rate, ch, bits, n)) =>
              AudioFeatures(r.doc_id, "wav", rate, ch, bits, n, n * 1000L / rate)
            case None => AudioFeatures(r.doc_id, "unknown", 0, 0, 0, 0L, 0L)
          }
        }
      }
  }

  case class PixelStats(doc_id: Long, width: Int, height: Int,
                        n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
                        max_r: Int, max_g: Int, max_b: Int)

  /** REAL pixel decode for the one format a pure-JVM implementation is
    * cheap: PNG, 8-bit RGB (color type 2), non-interlaced — concatenate
    * the IDAT chunks, inflate the zlib stream (`java.util.zip.Inflater`),
    * and invert the five standard scanline filters
    * (None/Sub/Up/Average/Paeth). Returns the unfiltered RGB raster, or
    * None for anything that is not a well-formed PNG of that shape
    * (other color types/bit depths would extend the same loop; compressed
    * formats like JPEG still need a codec). This retires the stub kernel
    * for PNG — `mm_pixel_stats` oracles the decode against the
    * generator's chosen pixel values (gen.MediaGen.pngWithPixels).
    */
  /** Decoded-raster allocation cap (256 MB ≈ a 9k×9k RGB frame): any IHDR
    * claiming more is rejected as undecodable rather than allocated —
    * per-row memory safety against adversarial headers.
    */
  val MaxDecodedBytes: Long = 256L << 20

  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    if (b.length < 8 + 25 || u8(0) != 0x89 || u8(1) != 'P' || u8(2) != 'N' ||
      u8(3) != 'G') return None
    // walk chunks: IHDR first, IDATs concatenated, stop at IEND
    var i = 8
    var w = 0; var h = 0; var ok = false
    val z = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length) {
      val len = be32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length) return None
      val typ = new String(b.slice(i + 4, i + 8), "ISO-8859-1")
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(i + 8).toInt; h = be32(i + 12).toInt
          val (depth, color, interlace) = (u8(i + 16), u8(i + 17), u8(i + 20))
          if (depth != 8 || color != 2 || interlace != 0 || w <= 0 || h <= 0)
            return None
          ok = true
        case "IDAT" => z.write(b, i + 8, len.toInt)
        case _ => ()
      }
      i += 12 + len.toInt
    }
    if (!ok || z.size() == 0) return None
    val bpp = 3
    // raw buffer sized in LONG first: adversarial IHDR dimensions (e.g.
    // 40000×40000) overflow `h*(1+3w)` in Int to a negative size (crash)
    // or demand multi-GB allocations (OOM) — both must be a clean None,
    // an undecodable blob, never a task kill
    val rawLen = h.toLong * (1L + w.toLong * bpp)
    if (rawLen > MaxDecodedBytes) return None
    val stride = w * bpp
    val raw = new Array[Byte](rawLen.toInt)
    // inf.end() must run on EVERY exit (early returns, DataFormatException):
    // Inflater holds native zlib state outside the JVM heap, so a leak per
    // corrupt blob accumulates off-heap pressure across a long scan
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // n == 0 = no forward progress: truncated stream (needsInput), or
        // one this decoder cannot drive at all — e.g. an FDICT zlib
        // header demanding a preset dictionary, where needsInput stays
        // false and the previous needsInput-only check spun forever
        if (n == 0) return None
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // invert the per-scanline filters in place into `out`
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val p = a + bb - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - bb), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      var k = 0
      while (k < stride) {
        val enc = raw(y * (1 + stride) + 1 + k) & 0xff
        val left = if (k >= bpp) out(y * stride + k - bpp) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + k) & 0xff else 0
        val upLeft = if (y > 0 && k >= bpp) out((y - 1) * stride + k - bpp) & 0xff else 0
        val dec = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + (left + up) / 2
          case _ => enc + paeth(left, up, upLeft)
        }
        out(y * stride + k) = dec.toByte
        k += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** Per-image channel statistics from the REAL decode — one row per
    * decodable PNG, nothing for other payloads. Same bucketed
    * mapPartitions batch shape as the other kernels; at scale the decode
    * is embarrassingly parallel and the stats are a narrow projection
    * (no shuffle until a downstream rollup).
    */
  def extractPixelStats(spark: SparkSession, media: DataFrame,
                        buckets: Int = 32): Dataset[PixelStats] = {
    import spark.implicits._
    media
      .repartition(buckets, pmod(col("doc_id"), lit(buckets)))
      .select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodePngPixels(r.media).map { case (w, h, px) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var (mr, mg, mb) = (0, 0, 0)
            var i = 0
            while (i < px.length) {
              val rr = px(i) & 0xff; val gg = px(i + 1) & 0xff; val bb = px(i + 2) & 0xff
              sr += rr; sg += gg; sb += bb
              if (rr > mr) mr = rr; if (gg > mg) mg = gg; if (bb > mb) mb = bb
              i += 3
            }
            PixelStats(r.doc_id, w, h, w.toLong * h, sr, sg, sb, mr, mg, mb)
          }
        }
      }
  }

  /** STUB decode kernel: a real implementation would hand `bytes` to a codec
    * (JPEG/PNG/ffmpeg). This deterministic fake derives pseudo-dimensions
    * from a rolling checksum so the downstream plumbing is exercised with
    * stable values. PNG decode is REAL now ([[decodePngPixels]]); this
    * stub remains the stand-in for codec-backed formats only.
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
    * first so blob sizes spread evenly across tasks. Real image headers
    * (PNG/GIF/JPEG) get REAL dimensions via [[parseImageHeader]]; anything
    * else goes through the deterministic stub.
    */
  def extractFeatures(spark: SparkSession, documents: DataFrame,
                      buckets: Int = 32): Dataset[MediaFeatures] =
    extractFeaturesFromMedia(spark, withMediaColumn(documents), buckets)

  /** Same extraction over an existing `(doc_id, media: binary)` column —
    * the entry point for real media tables (no text round-trip).
    */
  def extractFeaturesFromMedia(spark: SparkSession, media: DataFrame,
                               buckets: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .repartition(buckets, pmod(col("doc_id"), lit(buckets)))
      .select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          parseImageHeader(r.media) match {
            case Some((fmt, w, h)) =>
              MediaFeatures(r.doc_id, fmt, r.media.length.toLong, w, h, 1,
                java.util.Arrays.hashCode(r.media).toLong)
            case None =>
              val (w, h, frames, checksum) = fakeDecode(r.media)
              MediaFeatures(r.doc_id, "synthetic", r.media.length.toLong,
                w, h, frames, checksum)
          }
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

  /** Rollup over extracted features — the query surface the harness checks.
    * Fully oracled: the stub's FNV-ish fold is deterministic over the
    * fixture's UTF-8 blobs, so the DuckDB oracle replays it with HUGEINT
    * modular arithmetic (see SparkEntry.oracleSql "mm_media_summary").
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
