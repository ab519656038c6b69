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
}
