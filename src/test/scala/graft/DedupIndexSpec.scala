package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupApprox, DedupIndex}

/** Incremental dedup against the persisted prefix index: probe ≡ the EXACT
  * whole-corpus pair join restricted to delta-touching pairs (no LSH recall
  * caveat — the candidate generator is prefix filtering under the index's
  * frozen shingle order), delta↔delta caught, corpus↔corpus excluded,
  * bucket-pruned index reads, empty-safe.
  */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus with a planted near-dup pair (1,2), an exact dup of 3 arriving
  // in the delta (103), a delta-internal dup pair (104,108), and noise
  private val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank y'all"),
    (3L, "pack my box with five dozen liquor jugs before the long summer ends"),
    (5L, "completely unrelated text about spark catalyst optimizer internals and codegen"),
    (7L, "seven is another noise document with its own entirely distinct vocabulary"))
  private val deltaDocs = Seq(
    (103L, "pack my box with five dozen liquor jugs before the long summer ends"),
    (104L, "a duplicated delta document that repeats its phrasing almost word for word"),
    (108L, "a duplicated delta document that repeats its phrasing almost word by word"),
    (111L, "noise in the delta that matches nothing in the corpus or the batch"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("probe equals the exact whole-corpus pair join restricted to delta-touching pairs") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    val got = pairsOf(DedupIndex.probeDelta(spark, idx,
      deltaDocs.toDF("doc_id", "text"), 0.6))

    // the EXACT generator, not minhashPairs: the probe carries no LSH
    // recall caveat, so it must reproduce the exact join's restriction
    val all = pairsOf(DedupApprox.jaccardJoin(
      (corpusDocs ++ deltaDocs).toDF("doc_id", "text"), 0.6))
    val deltaIds = deltaDocs.map(_._1).toSet
    val expected = all.filter { case (a, b) =>
      deltaIds.contains(a) || deltaIds.contains(b) }
    assert(got == expected)
    assert(got.contains((3L, 103L)), "delta↔corpus dup must surface")
    assert(got.contains((104L, 108L)), "delta↔delta dup must surface")
    assert(!got.contains((1L, 2L)), "corpus↔corpus pairs are not the probe's business")
  }

  test("index reads are bucket-pruned partition filters, not full scans") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    val probe = DedupIndex.probeDelta(spark, idx,
      deltaDocs.toDF("doc_id", "text"), 0.6)
    probe.collect()
    // plan-text assertions (the RunLogSpec pattern — scan nodes sit inside
    // AQE query stages that TreeNode.collect does not descend into). The
    // refine plan carries the doc_bucket-pruned shingle scan; the frozen
    // freq and corpus-prefix scans live behind the probe's checkpoints, so
    // they are asserted on the deltaPrefixStage/candidateStage seams.
    // value-list membership renders as "IN (…)" for few values, "INSET …"
    // for many — both are the pruned form
    def pruned(plan: String, bucketCol: String): Boolean =
      plan.contains("PartitionFilters") &&
        (plan.contains(s"$bucketCol#") &&
          (plan.contains("IN (") || plan.contains("INSET")))
    val plan = probe.queryExecution.executedPlan.toString
    assert(pruned(plan, "doc_bucket"),
      s"expected doc_bucket membership pruning in:\n$plan")
    val deltaPrefix = DedupIndex.deltaPrefixStage(spark, idx,
      deltaDocs.toDF("doc_id", "text"))
    deltaPrefix.collect()
    val prefixPlan = deltaPrefix.queryExecution.executedPlan.toString
    assert(pruned(prefixPlan, "sh_bucket"),
      s"expected sh_bucket membership pruning on the freq read in:\n$prefixPlan")
    val cand = DedupIndex.candidateStage(spark, idx, deltaPrefix, 0.6)
    cand.collect()
    val candPlan = cand.queryExecution.executedPlan.toString
    assert(pruned(candPlan, "sh_bucket"),
      s"expected sh_bucket membership pruning on the prefix read in:\n$candPlan")
  }

  test("a probe below the index's committed threshold is rejected") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    // stored prefixes are sized for IndexThreshold — a lower probe would
    // silently false-negative, so it must fail loudly instead
    assertThrows[IllegalArgumentException] {
      DedupIndex.probeDelta(spark, idx, deltaDocs.toDF("doc_id", "text"),
        DedupIndex.IndexThreshold - 0.1)
    }
  }

  test("append extends the index: the next batch probes against the admitted one") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    DedupIndex.appendToIndex(deltaDocs.toDF("doc_id", "text"), idx)
    // batch 2 duplicates a batch-1 doc (104) and a corpus doc (1)
    val batch2 = Seq(
      (201L, "a duplicated delta document that repeats its phrasing almost word for word"),
      (202L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (203L, "fresh batch two material sharing nothing with anything seen before"))
    val got = pairsOf(DedupIndex.probeDelta(spark, idx,
      batch2.toDF("doc_id", "text"), 0.6))
    assert(got.contains((104L, 201L)),
      "batch-2 dup of an ADMITTED batch-1 doc must surface")
    assert(got.contains((1L, 202L)),
      "batch-2 dup of an original corpus doc must still surface")
    assert(!got.exists { case (a, b) => a <= 111L && b <= 111L },
      "pairs not touching batch 2 are not the probe's business")
  }

  test("bucket counts self-describe in meta, appends inherit them, probes stay exact") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    // pinned counts (a tiny corpus would clamp to MinBuckets otherwise)
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx,
      shingleBuckets = 64, docBuckets = 32)
    val meta = spark.read.parquet(s"$idx/meta")
      .select("sh_buckets", "doc_buckets", "n_postings").head()
    assert(meta.getLong(0) == 64L && meta.getLong(1) == 32L)
    assert(meta.getLong(2) > 0L)
    // append + probe inherit the committed layout from meta, not a
    // compiled-in constant — the whole-corpus equality must still hold
    DedupIndex.appendToIndex(deltaDocs.toDF("doc_id", "text"), idx)
    val batch2 = Seq(
      (201L, "a duplicated delta document that repeats its phrasing almost word for word"),
      (202L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val got = pairsOf(DedupIndex.probeDelta(spark, idx,
      batch2.toDF("doc_id", "text"), 0.6))
    val all = pairsOf(DedupApprox.jaccardJoin(
      (corpusDocs ++ deltaDocs ++ batch2).toDF("doc_id", "text"), 0.6))
    val b2 = batch2.map(_._1).toSet
    assert(got == all.filter { case (a, b) => b2.contains(a) || b2.contains(b) })
    // default sizing: a tiny corpus clamps to MinBuckets
    val idx2 = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx2)
    val meta2 = spark.read.parquet(s"$idx2/meta")
      .select("sh_buckets", "doc_buckets").head()
    assert(meta2.getLong(0) == DedupIndex.MinBuckets.toLong &&
      meta2.getLong(1) == DedupIndex.MinBuckets.toLong)
  }

  test("appends keep n_postings current; rebucket re-partitions bit-identically and later appends inherit the new layout") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx,
      shingleBuckets = 4, docBuckets = 4)
    DedupIndex.appendToIndex(deltaDocs.toDF("doc_id", "text"), idx)
    // the volume stamp is CURRENT after an append (the r19 lifecycle gap:
    // stale n_postings meant rebucketAdvised could never fire)
    val stamped = spark.read.parquet(s"$idx/meta")
      .select("n_postings").head().getLong(0)
    assert(stamped == spark.read.parquet(s"$idx/shingles").count(),
      "appendToIndex must stamp the grown posting volume into meta")
    assert(!DedupIndex.rebucketAdvised(spark, idx),
      "a fixture-scale index is far under the rebucket threshold")

    val batch2 = Seq(
      (201L, "a duplicated delta document that repeats its phrasing almost word for word"),
      (202L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val before = pairsOf(DedupIndex.probeDelta(spark, idx,
      batch2.toDF("doc_id", "text"), 0.6))

    // OPTIMIZE: new bucket counts, same rows, same frozen order — the
    // probe answer must be IDENTICAL (grown ≡ re-bucketed)
    DedupIndex.rebucketIndex(spark, idx, shingleBuckets = 8, docBuckets = 8)
    val meta = spark.read.parquet(s"$idx/meta")
      .select("sh_buckets", "doc_buckets", "n_postings").head()
    assert(meta.getLong(0) == 8L && meta.getLong(1) == 8L)
    assert(meta.getLong(2) == stamped,
      "re-bucketing moves rows, never loses or invents them")
    assert(pairsOf(DedupIndex.probeDelta(spark, idx,
      batch2.toDF("doc_id", "text"), 0.6)) == before,
      "re-bucketed probe must answer bit-identically to the grown index")
    assert(!graft.streaming.TableFs.exists(s"$idx/freq.rb") &&
      !graft.streaming.TableFs.exists(s"$idx/${DedupIndex.RebucketSentinel}"),
      "a completed swap leaves no staging or sentinel behind")

    // appends after the rebucket inherit the NEW layout and stay exact
    DedupIndex.appendToIndex(batch2.toDF("doc_id", "text"), idx)
    val batch3 = Seq(
      (301L, "pack my box with five dozen liquor jugs before the long summer ends"))
    val got = pairsOf(DedupIndex.probeDelta(spark, idx,
      batch3.toDF("doc_id", "text"), 0.6))
    val all = pairsOf(DedupApprox.jaccardJoin(
      (corpusDocs ++ deltaDocs ++ batch2 ++ batch3).toDF("doc_id", "text"), 0.6))
    assert(got == all.filter { case (a, b) => a == 301L || b == 301L })
  }

  test("an interrupted rebucket swap is refused by probes/appends and completed by the recovery") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    // simulate a crash between delete(freq) and its rename: freq lives
    // only in its staged name, sentinel still present
    val fs = graft.streaming.TableFs.fs(idx)
    assert(fs.rename(graft.streaming.TableFs.path(s"$idx/freq"),
      graft.streaming.TableFs.path(s"$idx/freq.rb")))
    graft.streaming.TableFs.writeString(
      s"$idx/${DedupIndex.RebucketSentinel}", "swapping\n")
    val delta = deltaDocs.toDF("doc_id", "text")
    val eProbe = intercept[IllegalArgumentException] {
      DedupIndex.probeDelta(spark, idx, delta, 0.6)
    }
    assert(eProbe.getMessage.contains("interrupted re-bucket swap"))
    val eAppend = intercept[IllegalArgumentException] {
      DedupIndex.appendToIndex(delta, idx)
    }
    assert(eAppend.getMessage.contains("interrupted re-bucket swap"))
    // recovery completes the half-swap (staged dirs are complete by
    // construction) and the index answers as if never interrupted
    DedupIndex.completeSwapIfInterrupted(idx)
    assert(!graft.streaming.TableFs.exists(s"$idx/${DedupIndex.RebucketSentinel}"))
    assert(graft.streaming.TableFs.exists(s"$idx/freq"))
    val got = pairsOf(DedupIndex.probeDelta(spark, idx, delta, 0.6))
    assert(got.contains((3L, 103L)) && got.contains((104L, 108L)))
  }

  test("an empty delta probes to an empty result") {
    val idx = Files.createTempDirectory("graft-lshidx").toString
    DedupIndex.buildIndex(corpusDocs.toDF("doc_id", "text"), idx)
    assert(DedupIndex.probeDelta(spark, idx,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 0.6).count() == 0L)
  }
}
