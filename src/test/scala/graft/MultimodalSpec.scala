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
