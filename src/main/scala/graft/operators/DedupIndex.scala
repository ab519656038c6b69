package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted EXACT dedup index + incremental probe — the production shape of
  * near-dup at 100 TB: the historical corpus is indexed ONCE on disk, and
  * each new crawl batch is deduplicated against it (and itself) without ever
  * generating a corpus×corpus pair. Re-running the whole-corpus pair join
  * per batch ([[DedupApprox.jaccardJoin]]) is the special case "every batch
  * is the full corpus"; this operator is the incremental form, the same
  * split the persisted IVF/BM25 indexes make for vectors and retrieval
  * ([[Ann.buildIvfIndex]], [[Retrieval]]).
  *
  * Candidate generation is the PPJoin prefix-filter scheme (Bayardo et al.
  * All-Pairs; Xiao et al. WWW'08) — the same exact, no-false-negative
  * generator as [[DedupApprox.jaccardJoin]] — NOT MinHash banding. An
  * earlier revision of this index generated candidates from LSH band
  * agreement; at 4 bands × 4 rows a true Jaccard-0.8 pair band-misses with
  * probability (1−0.8⁴)⁴ ≈ 12 %, so the probe was only probabilistically
  * equal to the whole-corpus recompute it claims to reproduce — a
  * threshold-grazing near-dup could be silently admitted. Prefix filtering
  * closes that hole: for any pair with J ≥ t, the two docs' prefixes under
  * a consistent global shingle order MUST intersect, so the probe's output
  * (after the exact-Jaccard refine both schemes share) equals the
  * whole-corpus pair set restricted to delta-touching pairs, bit for bit.
  *
  * Prefix filtering needs every doc's prefix computed under the SAME total
  * order. Order quality only affects COST (rare-first keeps hot shingles
  * out of prefixes), never correctness — so the index FREEZES the seed
  * corpus's (document-frequency, shingle) order at build time in `freq/`,
  * and every later prefix (appended batches, probe deltas) is computed
  * against that frozen table, with unseen shingles ordering as df = 0 —
  * first, i.e. rarest, which is also the efficiency-correct guess for
  * genuinely new vocabulary. Frequency DRIFT as the corpus grows degrades
  * pruning efficiency gradually (a once-rare shingle that becomes common
  * stays prefix-eligible) but can never drop a true pair.
  *
  * Index layout (plain bucket-partitioned parquet):
  *  - `freq/sh_bucket=<xxhash64(shingle) mod shBuckets>/` — the FROZEN
  *    `(shingle, df)` order table (written at build, never updated);
  *  - `prefix/sh_bucket=…/` — per-doc prefix postings `(doc_id, n, pos,
  *    shingle)` at [[IndexThreshold]] (prefixes for a LOWER threshold are
  *    longer, so any probe at ≥ [[IndexThreshold]] sees a candidate
  *    superset — still exact, just less pruned);
  *  - `shingles/doc_bucket=<doc_id mod docBuckets>/` — the exact-refine
  *    inverted index `(doc_id, n, shingle)`;
  *  - `meta/` — ONE row `(n_postings, sh_buckets, doc_buckets,
  *    threshold)`: the layout SELF-DESCRIBES, so probes and appends
  *    inherit whatever bucket counts the build chose.
  *
  * BUCKET SIZING is what keeps the probe-I/O contract meaningful as the
  * corpus grows (the round-18 verdict's saturation finding, the same
  * shape round 17 fixed for BM25): with a FIXED bucket count C, any batch
  * whose shingles hash into ≥ C buckets reads the WHOLE prefix index — a
  * linear corpus scan in disguise. The build therefore sizes bucket
  * counts for CONSTANT PER-BUCKET VOLUME — ⌈postings /
  * [[TargetRowsPerBucket]]⌉, clamped to [[MinBuckets]]..[[MaxBuckets]] —
  * which for this index beats the BM25 √-rule on both ends: a FIXED
  * batch touching b shingle buckets reads ≤ b·[[TargetRowsPerBucket]]
  * rows — CONSTANT in index size until the [[MaxBuckets]] clamp, then
  * index/[[MaxBuckets]]-grained (√-sizing would grow those reads as
  * √index, and measurably over-shards: at the 100k-doc probe point,
  * √(3.4M) ≈ 1850 bucket dirs cost 2.7× probe wall-clock in pure
  * file/listing overhead against a saturating batch — measured before
  * rejecting it, r19). Shingle vocabularies are unbounded (n-gram
  * shingles), so realistic batches SATURATE any shingle-bucket count —
  * the constant-volume rule keeps that saturated read a full-index scan
  * of healthy ≈MB-sized objects while making trickle probes and the
  * candidate-doc refine reads O(batch), and it reproduces the prior
  * 16-bucket layout at fixture scale (no regression; re-measured in
  * `DedupIndexProbe`, BASELINE.md). Pass explicit counts to pin a
  * layout; they self-describe in `meta/` either way.
  *
  * Probe I/O contract: a delta batch reads ONLY
  *  - the freq + prefix shingle buckets its own shingles hash into, and
  *  - the shingle buckets of its candidates' corpus docs
  * — all resolved as partition values (`PartitionFilters`, asserted in
  * `DedupIndexSpec`). The structural win against the whole-corpus rerun
  * is twofold: the probe never generates or refines corpus×corpus pairs
  * (the term that grows superlinearly with the corpus), and with
  * constant-volume buckets a fixed batch's index reads stay constant in
  * the corpus until the clamp. The driver-side `collect`s
  * are bucket-id lists, bounded by the bucket counts (≤ [[MaxBuckets]])
  * — O(model), never O(data).
  */
object DedupIndex {

  /** Bucket-count clamp for the constant-volume auto-sizing rule — same
    * bounds as [[Retrieval.MinBuckets]]/[[Retrieval.MaxBuckets]]: enough
    * buckets that pruning always has something to prune, few enough that
    * tiny fixtures don't shatter into thousands of files. */
  val MinBuckets = 16
  val MaxBuckets = 4096

  /** Target posting rows per bucket (≈ a few MB of parquet — the healthy
    * object size): buckets = ⌈postings / this⌉ within the clamp, so a
    * bucket read is unit-cost and a fixed batch's probe I/O is constant
    * in the index size until [[MaxBuckets]]. */
  val TargetRowsPerBucket = 262144L

  /** The threshold the committed prefixes are sized for. Probes at any
    * `threshold ≥ IndexThreshold` are exact (stored prefixes are supersets
    * of what that threshold needs); probing BELOW it would false-negative
    * and is rejected. */
  val IndexThreshold = 0.6

  private def shBucket(n: Long): Column =
    pmod(xxhash64(col("shingle")), lit(n))

  private def docBucket(n: Long): Column = pmod(col("doc_id"), lit(n))

  /** The self-described layout of a committed index. */
  private def layout(spark: SparkSession, indexPath: String): (Long, Long) = {
    val m = spark.read.parquet(s"$indexPath/meta")
      .select("sh_buckets", "doc_buckets").head()
    (m.getLong(0), m.getLong(1))
  }

  /** Fingerprint `documents` into the on-disk index at `indexPath`
    * (overwrite): freeze the corpus df order, then write the prefix and
    * full-posting sub-indexes under constant-volume (or pinned) bucket
    * counts.
    * One window shuffle (per-doc shingle ranks) + three narrow writes —
    * no joins against anything preexisting, no all-pairs anything; cost
    * is O(corpus postings) once, amortized over every subsequent batch
    * probe. Bucketed writes `repartition(bucket)` first so each bucket's
    * rows land in one task — O(buckets) files total, not
    * buckets × shuffle-partitions.
    */
  def buildIndex(documents: DataFrame, indexPath: String,
                 shingleBuckets: Int = 0, docBuckets: Int = 0): Unit = {
    val inv = DedupApprox.shingleIndex(documents)
      .persist() // consumed by the sizing count + freq agg + two writes
    try {
      val nPostings = inv.count()
      def sized(pinned: Int): Long =
        if (pinned > 0) pinned.toLong
        else math.max(MinBuckets.toLong, math.min(MaxBuckets.toLong,
          (nPostings + TargetRowsPerBucket - 1) / TargetRowsPerBucket))
      val shB = sized(shingleBuckets)
      val docB = sized(docBuckets)
      val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      freq.withColumn("sh_bucket", shBucket(shB))
        .repartition(col("sh_bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sh_bucket").parquet(s"$indexPath/freq")
      // read the COMMITTED table back so build-time prefixes and every later
      // probe/append provably order under the same frozen values
      val frozen = documents.sparkSession.read.parquet(s"$indexPath/freq")
        .select("shingle", "df")
      DedupApprox.prefixPostings(inv, frozen, IndexThreshold)
        .withColumn("sh_bucket", shBucket(shB))
        .repartition(col("sh_bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sh_bucket").parquet(s"$indexPath/prefix")
      inv
        .withColumn("doc_bucket", docBucket(docB))
        .repartition(col("doc_bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("doc_bucket").parquet(s"$indexPath/shingles")
      val spark = documents.sparkSession
      import spark.implicits._
      Seq((nPostings, shB, docB, IndexThreshold))
        .toDF("n_postings", "sh_buckets", "doc_buckets", "threshold")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexPath/meta")
    } finally { inv.unpersist(blocking = false); () }
  }

  /** Near-dup pairs at `threshold` where AT LEAST ONE side is a `delta`
    * doc: delta↔corpus through the index, delta↔delta within the batch.
    * Pairs are emitted once as (doc_a < doc_b) with the exact Jaccard.
    * Caller contract: delta doc_ids are disjoint from the indexed corpus
    * (an id present in both would pair with itself through a stale
    * fingerprint), and `threshold ≥ IndexThreshold`.
    */
  def probeDelta(spark: SparkSession, indexPath: String, delta: DataFrame,
                 threshold: Double): DataFrame = {
    require(threshold >= IndexThreshold,
      s"index prefixes are sized for thresholds >= $IndexThreshold; got $threshold")
    // the 1-row meta read happens ONCE per probe and threads through the
    // stage helpers (each also reads it standalone for the test seams)
    val (shB, docB) = layout(spark, indexPath)
    // checkpointed: consumed by the frozen-order prefix computation AND
    // both refine sides
    val deltaInv = DedupApprox.shingleIndex(delta).localCheckpoint(true)
    // checkpointed: consumed by both the bucket-list collect and the
    // candidate join (the sh_bucket-pruned prefix scan therefore lives in
    // THIS stage's plan, asserted via the candidateStage seam in
    // DedupIndexSpec)
    val deltaPrefix =
      deltaPrefixOfInv(spark, indexPath, deltaInv, shB).localCheckpoint(true)
    val candidates =
      candidateStageOf(spark, indexPath, deltaPrefix, threshold, shB)
        .localCheckpoint(true)

    // refine postings: delta fresh, corpus bucket-pruned to candidate docs
    // (the refine's own equi-join selects the exact docs within buckets)
    val candidateDocBuckets = candidates
      .select(explode(array(
        pmod(col("doc_a"), lit(docB)),
        pmod(col("doc_b"), lit(docB)))).as("b"))
      .distinct().collect().map(_.getLong(0)) // ≤ doc_buckets values
    val corpusInv = spark.read.parquet(s"$indexPath/shingles")
      .filter(col("doc_bucket").isin(candidateDocBuckets: _*))
      .select("doc_id", "n", "shingle")
    val inv = corpusInv.union(deltaInv)
    DedupApprox.exactJaccardRefine(candidates, inv, threshold)
  }

  /** Admit a probed batch into the index — the lifecycle's third step
    * (probe → retain survivors → EXTEND): the batch's postings and
    * frozen-order prefixes append into the same bucket layout (counts
    * inherited from `meta/`), so the next batch's probe sees this one as
    * corpus. `freq/` is NOT updated — the order must stay the one every
    * committed prefix was computed under. Appends are new files in
    * existing bucket dirs — no rewrite of prior index data, O(batch) I/O.
    * Caller admits whichever doc set survived its retention policy
    * (typically the probe's non-duplicates, or everything when near-dups
    * are kept and only clustered downstream). Same id-disjointness
    * contract as [[probeDelta]].
    */
  def appendToIndex(documents: DataFrame, indexPath: String): Unit = {
    val spark = documents.sparkSession
    val (shB, docB) = layout(spark, indexPath)
    val inv = DedupApprox.shingleIndex(documents)
    val frozen = spark.read.parquet(s"$indexPath/freq")
      .select("shingle", "df")
    DedupApprox.prefixPostings(inv, frozen, IndexThreshold)
      .withColumn("sh_bucket", shBucket(shB))
      .repartition(col("sh_bucket"))
      .write.mode(SaveMode.Append)
      .partitionBy("sh_bucket").parquet(s"$indexPath/prefix")
    inv
      .withColumn("doc_bucket", docBucket(docB))
      .repartition(col("doc_bucket"))
      .write.mode(SaveMode.Append)
      .partitionBy("doc_bucket").parquet(s"$indexPath/shingles")
  }

  /** Delta prefixes under the index's frozen order — the freq read is
    * sh_bucket-pruned to the delta's own shingle buckets (a `collect` of
    * ≤ sh_buckets bucket ids, O(model)).
    */
  private def deltaPrefixOfInv(spark: SparkSession, indexPath: String,
                               deltaInv: DataFrame, shB: Long): DataFrame = {
    val deltaShBuckets = deltaInv
      .select(shBucket(shB).as("b")).distinct()
      .collect().map(_.getLong(0)) // ≤ sh_buckets values
    val frozen = spark.read.parquet(s"$indexPath/freq")
      .filter(col("sh_bucket").isin(deltaShBuckets: _*))
      .select("shingle", "df")
    DedupApprox.prefixPostings(deltaInv, frozen, IndexThreshold)
  }

  /** [[deltaPrefixOfInv]] from raw documents — the test seam for the
    * pruned-read plan assertions. */
  private[graft] def deltaPrefixStage(spark: SparkSession, indexPath: String,
                                      delta: DataFrame): DataFrame =
    deltaPrefixOfInv(spark, indexPath, DedupApprox.shingleIndex(delta),
      layout(spark, indexPath)._1)

  /** Candidate generation against the prefix index: the corpus side is
    * read with a `sh_bucket` partition filter resolved from the delta's
    * own prefix shingles. Delta side 'a' ⇒ every candidate touches the
    * delta; least/greatest + distinct inside [[DedupApprox.prefixCandidates]]
    * canonicalizes delta↔delta pairs found from both ends.
    */
  private[graft] def candidateStage(spark: SparkSession, indexPath: String,
                                    deltaPrefix: DataFrame,
                                    threshold: Double): DataFrame =
    candidateStageOf(spark, indexPath, deltaPrefix, threshold,
      layout(spark, indexPath)._1)

  private def candidateStageOf(spark: SparkSession, indexPath: String,
                               deltaPrefix: DataFrame,
                               threshold: Double, shB: Long): DataFrame = {
    val probedShBuckets = deltaPrefix
      .select(shBucket(shB).as("b")).distinct()
      .collect().map(_.getLong(0)) // ≤ sh_buckets values
    val corpusPrefix = spark.read.parquet(s"$indexPath/prefix")
      .filter(col("sh_bucket").isin(probedShBuckets: _*))
      .select("doc_id", "n", "pos", "shingle")
    DedupApprox.prefixCandidates(
      deltaPrefix, corpusPrefix.union(deltaPrefix), threshold)
  }
}
