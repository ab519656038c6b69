package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupIndex}
import graft.streaming.{StreamCuration, StreamOracle}

/** The continuous-curation drain: ordered micro-batch delivery, the
  * batch-id ledger's replay idempotency, and the stream ≡ batch
  * equivalence on a hand-planted corpus (the CORRECTNESS row
  * `stream_curation` pins the same equivalence against DuckDB at sf0.01).
  */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // seed: 2 docs; stream: 4 docs in 2 batches — exact dup of a seed doc
  // (11), a near-dup pair across the streamed batches (12 ≈ 13), noise
  private val seedDocs = Seq(
    (1L, "pack my box with five dozen liquor jugs before the long summer ends"),
    (2L, "completely unrelated text about spark catalyst optimizer internals and codegen"))
  private val streamDocs = Seq(
    (11L, "pack my box with five dozen liquor jugs before the long summer ends"),
    (12L, "a duplicated streaming document that repeats its phrasing almost word for word"),
    (13L, "a duplicated streaming document that repeats its phrasing almost word by word"),
    (14L, "noise in the stream that matches nothing in the corpus or the batch"))

  private def seedExactOf(seed: org.apache.spark.sql.DataFrame) =
    seed.join(Dedup.exactByContent(seed, "text", "doc_id")
      .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")

  private def build(): (String, String) = {
    val root = Files.createTempDirectory("graft-scur").toString
    val idx = s"$root/idx"
    val seed = seedDocs.toDF("doc_id", "text")
    val seedExact = seedExactOf(seed)
    DedupIndex.buildIndex(seedExact, idx)
    seedExact.write.mode("overwrite").parquet(s"$root/exact")
    StreamCuration.stageMonotoneBatches(spark,
      streamDocs.toDF("doc_id", "text"), s"$root/in", 2)
    (root, idx)
  }

  private def drain(root: String, idx: String, ckpt: String): Unit =
    StreamCuration.maintainCuration(spark,
      StreamOracle.fileStream(spark, s"$root/in", maxFilesPerTrigger = Some(1)),
      idx, root, ckpt, jaccardThreshold = 0.6, minQuality = 0.0)
      .awaitTermination()

  test("ordered micro-batches curate exactly like the batch admission; replay with a fresh checkpoint is a no-op") {
    val (root, idx) = build()
    drain(root, idx, s"$root/_ckpt1")
    val admitted = spark.read.parquet(s"$root/curated")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 11 = exact dup of seed 1 (dropped); 13 = near-dup higher id of 12
    // (dropped); 12 and 14 admitted
    assert(admitted == Seq(12L, 14L))
    // the exact-survivor table grew by the admitted batches' exact set
    assert(spark.read.parquet(s"$root/exact")
      .select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 12L, 13L, 14L),
      "exact survivors = seed + streamed exact-new docs (13 is a NEAR dup — it stays in the exact set)")
    // REPLAY: a fresh checkpoint re-delivers every file with the same
    // batch ids — the ledger must skip every fully-committed batch, so
    // nothing duplicates (rows, postings, survivors)
    drain(root, idx, s"$root/_ckpt2")
    assert(spark.read.parquet(s"$root/curated")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(12L, 14L),
      "replayed batches must be skipped whole by the ledger")
    assert(spark.read.parquet(s"$root/exact").count() == 5L)
  }

  test("staged batches carry strictly increasing mtimes and ascending id ranges") {
    val dir = Files.createTempDirectory("graft-scur-stage").toString
    StreamCuration.stageMonotoneBatches(spark,
      streamDocs.toDF("doc_id", "text"), dir, 2)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 2)
    assert(files(0).lastModified < files(1).lastModified,
      "equal mtimes would let one trigger glue or reorder batches")
    val b0 = spark.read.parquet(files(0).getPath)
      .agg(max(col("doc_id"))).head().getLong(0)
    val b1 = spark.read.parquet(files(1).getPath)
      .agg(min(col("doc_id"))).head().getLong(0)
    assert(b0 < b1, "batch files must partition the id range monotonically")
  }
}
