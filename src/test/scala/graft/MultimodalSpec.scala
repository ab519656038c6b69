package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary column + metadata schema, deterministic
  * batched extraction, stable summary.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media column carries binary payload + typed metadata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Multimodal.withMediaColumn(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = m.schema("media_meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("content_type", "n_bytes", "origin"))
    val row = m.first()
    assert(row.getAs[Array[Byte]]("media").length > 0)
  }

  test("feature extraction is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val f1 = Multimodal.extractFeatures(spark, docs, buckets = 4).collect()
      .sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, docs, buckets = 7).collect()
      .sortBy(_.doc_id)
    assert(f1.sameElements(f2))
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
  }

  test("real PNG/GIF/JPEG headers yield real dimensions, no codec involved") {
    // hand-assembled container headers — the actual byte layouts, not mocks
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00) // 320×240 LE
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14) ++ // APP0
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(1080) ++ be16(1920) ++ new Array[Byte](10) // SOF0: h=1080 w=1920
    assert(Multimodal.parseImageHeader(png).contains(("png", 640, 480)))
    assert(Multimodal.parseImageHeader(gif).contains(("gif", 320, 240)))
    assert(Multimodal.parseImageHeader(jpeg).contains(("jpeg", 1920, 1080)))
    assert(Multimodal.parseImageHeader("not an image".getBytes).isEmpty)

    // through the batched extraction path over a real binary column
    import spark.implicits._
    val mixed = Seq((1L, png), (2L, gif), (3L, jpeg), (4L, "plain text".getBytes))
      .toDF("doc_id", "media")
    val feats = Multimodal.extractFeaturesFromMedia(spark, mixed, buckets = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).format == "png" && feats(1L).width == 640 && feats(1L).height == 480)
    assert(feats(2L).format == "gif" && feats(2L).width == 320 && feats(2L).height == 240)
    assert(feats(3L).format == "jpeg" && feats(3L).width == 1920 && feats(3L).height == 1080)
    assert(feats(4L).format == "synthetic")
  }

  test("real WAV headers yield real sample counts and durations") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // 16-bit stereo 44.1 kHz, 1s of audio = 176400 data bytes (header only here)
    val wav = "RIFF".getBytes ++ le32(36 + 176400) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(176400)
    assert(Multimodal.parseWavHeader(wav).contains((44100, 2, 16, 44100L)))
    assert(Multimodal.parseWavHeader("not audio at all, definitely".getBytes).isEmpty)
    import spark.implicits._
    val media = Seq((1L, wav), (2L, "text".getBytes)).toDF("doc_id", "media")
    val feats = Multimodal.extractAudioFeatures(spark, media, buckets = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).format == "wav" && feats(1L).n_samples == 44100L &&
      feats(1L).duration_ms == 1000L)
    assert(feats(2L).format == "unknown")
  }

  test("real MP4 moov/mvhd headers yield real durations") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // ftyp box, then moov containing a v0 mvhd: timescale 600, duration 9000
    // ticks = 15 s
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(512)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ // version+flags
      be32(0) ++ be32(0) ++ be32(600) ++ be32(9000) ++ new Array[Byte](80)
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val mp4 = ftyp ++ moov
    assert(Multimodal.parseMp4Duration(mp4).contains(15000L))
    assert(Multimodal.parseMp4Duration("RIFFxxxxWAVE and then some".getBytes).isEmpty)
    assert(Multimodal.parseMp4Duration("definitely not a video".getBytes).isEmpty)
  }

  test("real MP4 trak/tkhd/hdlr headers yield per-track ids, handlers, dimensions") {
    import spark.implicits._
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(512)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(600) ++ be32(9000) ++ new Array[Byte](80)
    // v0 tkhd (92 bytes): ver+flags, creation, modification, track_id,
    // reserved, duration, reserved(8), layer/alt(4), volume/res(4),
    // matrix(36), then 16.16 width/height
    def tkhd(id: Int, w: Int, h: Int) =
      be32(92) ++ "tkhd".getBytes ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(id) ++ be32(0) ++ be32(9000) ++ new Array[Byte](8 + 4 + 4 + 36) ++
        be32(w << 16) ++ be32(h << 16)
    def hdlr(four: String) =
      be32(32) ++ "hdlr".getBytes ++ be32(0) ++ be32(0) ++ four.getBytes ++
        new Array[Byte](12)
    def mdia(four: String) = be32(8 + 32) ++ "mdia".getBytes ++ hdlr(four)
    def trak(id: Int, w: Int, h: Int, four: String) = {
      val body = tkhd(id, w, h) ++ mdia(four)
      be32(8 + body.length) ++ "trak".getBytes ++ body
    }
    val body = mvhd ++ trak(1, 320, 240, "vide") ++ trak(2, 0, 0, "soun")
    val mp4 = ftyp ++ be32(8 + body.length) ++ "moov".getBytes ++ body
    val tracks = Multimodal.parseMp4Tracks(mp4)
    assert(tracks == Seq(
      Multimodal.TrackInfo(1L, "vide", 320, 240),
      Multimodal.TrackInfo(2L, "soun", 0, 0)))
    assert(Multimodal.parseMp4Tracks("not mp4 at all".getBytes).isEmpty)
    // distributed surface: one row per track, only for MP4 payloads
    val media = Seq((7L, mp4), (8L, "plain text".getBytes))
      .toDF("doc_id", "media")
    val rows = Multimodal.extractVideoTracks(spark, media, buckets = 2)
      .collect().sortBy(r => (r.doc_id, r.track_id))
    assert(rows.length == 2 && rows.forall(_.doc_id == 7L))
    assert(rows.head.handler == "vide" && rows.head.width == 320 &&
      rows.head.height == 240)
  }

  test("committed media fixture: parsers re-derive the generator's ground truth from bytes") {
    // the differential behind mm_real_media / mm_real_audio / mm_real_tracks:
    // gen.MediaGen encodes CHOSEN parameters into genuine container bytes
    // and writes them as expected_* parquet; the parsers must re-derive the
    // identical values from the bytes alone
    val base = SparkEntry.MediaFixture
    val blobs = spark.read.parquet(s"$base/media_blobs")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSet
    val gotImages = Multimodal.extractFeaturesFromMedia(spark,
        blobs.filter(org.apache.spark.sql.functions.col("kind") === "image"))
      .toDF().select("doc_id", "format", "n_bytes", "width", "height", "n_frames")
    assert(rows(gotImages) == rows(spark.read.parquet(s"$base/expected_images")))
    val gotAudio = Multimodal.extractAudioFeatures(spark,
      blobs.filter(org.apache.spark.sql.functions.col("kind").isin("audio", "corrupt"))).toDF()
    assert(rows(gotAudio) == rows(spark.read.parquet(s"$base/expected_audio")))
    val gotTracks = Multimodal.extractVideoTracks(spark,
      blobs.filter(org.apache.spark.sql.functions.col("kind").isin("video", "corrupt"))).toDF()
    assert(rows(gotTracks) == rows(spark.read.parquet(s"$base/expected_tracks")))
    // corrupt payloads: every parser refuses all ten (None / unknown / no rows)
    val corrupt = blobs.filter(org.apache.spark.sql.functions.col("kind") === "corrupt")
    assert(corrupt.count() == 10)
    assert(Multimodal.extractVideoTracks(spark, corrupt).count() == 0)
    assert(Multimodal.extractFeaturesFromMedia(spark, corrupt).toDF()
      .filter(org.apache.spark.sql.functions.col("format") =!= "synthetic").count() == 0)
  }

  test("real PNG pixel decode: inflate + unfilter reproduces the chosen pixels") {
    // the differential behind mm_pixel_stats: pngWithPixels deflates REAL
    // filtered scanlines; decodePngPixels must reconstruct the exact
    // raster (every filter 0-4 appears across the rows of the fixture set)
    val (bytes, truth) = graft.gen.MediaGen.pngWithPixels(19, 11, 7)
    val Some((w, h, px)) = Multimodal.decodePngPixels(bytes)
    assert(w == 19 && h == 11 && px.length == 19 * 11 * 3)
    var (sr, sg, sb) = (0L, 0L, 0L)
    px.grouped(3).foreach { p =>
      sr += p(0) & 0xff; sg += p(1) & 0xff; sb += p(2) & 0xff
    }
    assert((sr, sg, sb) == (truth.sum_r, truth.sum_g, truth.sum_b))

    // the fixture end-to-end: stats over all 30 committed blobs ≡ truth
    val got = Multimodal.extractPixelStats(spark,
      spark.read.parquet(s"${SparkEntry.MediaFixture}/pixel_blobs")).toDF()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(rows(got) ==
      rows(spark.read.parquet(s"${SparkEntry.MediaFixture}/expected_pixels")))

    // refusal: header-only PNGs (filler IDAT, no real zlib stream), other
    // formats, and all ten corrupt payloads decode to None / no rows
    assert(Multimodal.decodePngPixels(graft.gen.MediaGen.png(64, 48, 3)).isEmpty)
    assert(Multimodal.decodePngPixels(graft.gen.MediaGen.jpeg(64, 48, 3)).isEmpty)
    graft.gen.MediaGen.corrupts.foreach { c =>
      assert(Multimodal.decodePngPixels(c.media).isEmpty)
    }
  }

  test("adversarial PNGs: FDICT streams and overflow dimensions reject cleanly") {
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("ISO-8859-1")); crc.update(payload)
      be32(payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload ++
        be32(crc.getValue)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr(w: Long, h: Long): Array[Byte] =
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)

    // FDICT zlib header (0x78 0x3F: CM=8, FDICT bit set, checksum-valid):
    // inflate() returns 0 with needsInput=false forever — the pre-fix loop
    // spun; must now return None (in bounded time, by construction)
    val fdict = sig ++ chunk("IHDR", ihdr(4, 4)) ++
      chunk("IDAT", Array[Byte](0x78, 0x3f, 1, 2, 3, 4)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePngPixels(fdict).isEmpty)

    // 40000×40000 IHDR: h*(1+3w) overflows Int to a negative array size —
    // pre-fix a NegativeArraySizeException killed the task; must be None
    val huge = sig ++ chunk("IHDR", ihdr(40000, 40000)) ++
      chunk("IDAT", Array[Byte](0x78, 0x01, 1)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePngPixels(huge).isEmpty)
  }

  test("resize planning caps the long edge and preserves aspect ratio") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(spark, docs)
    val planned = Multimodal.planResize(feats, maxSide = 256).collect()
    planned.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(tw <= 256 && th <= 256 && tw >= 1 && th >= 1)
      if (w <= 256 && h <= 256) assert(tw == w && th == h) // no upscaling
      // aspect ratio preserved within the rounding error of both edges
      // (±0.5px each on dims ≥ 64 → well under 2% relative)
      assert(math.abs(tw.toDouble / th - w.toDouble / h) <= 0.02 * (w.toDouble / h))
    }
  }

  test("frame sampling emits stride-N indices starting at frame 0") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(spark, docs)
    val frames = Multimodal.sampleFrames(feats, everyN = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val byId = feats.collect().map(f => f.doc_id -> f.n_frames).toMap
    assert(frames.keySet == byId.keySet)
    frames.foreach { case (id, rows) =>
      val idx = rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq
      assert(idx == (0 until byId(id) by 4).toSeq)
    }
  }
}
