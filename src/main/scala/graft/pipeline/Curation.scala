package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Components, Dedup, DedupApprox, TextOps}
import graft.sources.Tables

/** End-to-end training-data curation pipeline (BASELINE.json north star):
  * documents → exact dedup → near-dup pruning → quality filter → language
  * tag + token stats → curated corpus + corpus summary.
  *
  * Every stage is a key-partitioned DataFrame transformation:
  *  - exact dedup: hash group-by on the content sha256 (uniform shuffle key);
  *  - near-dup pruning: prefix-filtered exact Jaccard join (candidates via
  *    rare-shingle inverted index, never all-pairs), then greedy survivor
  *    selection — a doc is dropped iff it appears as the higher id of a
  *    surviving pair (left_anti join, no driver-side state);
  *  - quality/language/token columns: narrow codegen'd projections.
  */
object Curation {

  case class CurationResult(stage: String, docs: Long)

  /** Stage counts (`collectStats`) force one job per stage; the intermediate
    * stages are persisted while counting so the expensive jaccard-join
    * lineage runs once, not once per downstream count. With
    * `collectStats = true` the returned DataFrame still reads from the
    * persisted `nearDeduped` intermediate, so the CALLER's first
    * materialization reuses it — the caller owns releasing it when done via
    * the handle [[curateStaged]] returns (which [[run]] unpersists after its
    * write). With `collectStats = false` nothing is persisted at all — the
    * pipeline is a single lazy lineage for the caller's sink.
    */
  def curate(documents: DataFrame, jaccardThreshold: Double = 0.8,
             minQuality: Double = 0.3,
             collectStats: Boolean = true): (DataFrame, Seq[CurationResult]) = {
    val (curated, stages, _) =
      curateStaged(documents, jaccardThreshold, minQuality, collectStats)
    (curated, stages)
  }

  /** [[curate]] plus the persisted intermediates (empty when nothing was
    * persisted), so the caller can unpersist exactly those DataFrames once
    * its sink has materialized — never a session-global cache clear, which
    * would evict unrelated datasets a shared session may be caching.
    */
  /** Near-dup retention policy. `Greedy` drops the higher doc_id of every
    * surviving pair — conservative: a doc is removed only when it is
    * directly similar to a kept lower id. `Cluster` resolves the pair graph
    * to connected components first ([[Components.dedupClusters]]) and keeps
    * one canonical doc per component — aggressive: transitive chains
    * (A~B~C without A~C) collapse to a single survivor, the standard
    * MinHash-pipeline behavior for boilerplate families.
    */
  sealed trait NearDupPolicy
  case object Greedy extends NearDupPolicy
  case object Cluster extends NearDupPolicy

  def curateStaged(documents: DataFrame, jaccardThreshold: Double = 0.8,
                   minQuality: Double = 0.3,
                   collectStats: Boolean = true,
                   nearDupPolicy: NearDupPolicy = Greedy)
      : (DataFrame, Seq[CurationResult], Seq[DataFrame]) = {
    val stages = Seq.newBuilder[CurationResult]
    def stat(name: String, df: DataFrame): Unit =
      if (collectStats) stages += CurationResult(name, df.count())
    def persisted(df: DataFrame): DataFrame = if (collectStats) df.persist() else df
    stat("input", documents)

    // 1. exact content dedup: keep the min doc_id per sha256(text)
    val keep = Dedup.exactByContent(documents, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val exact = persisted(documents.join(keep, Seq("doc_id"), "left_semi"))
    stat("exact_dedup", exact)

    // 2. near-dup pruning: drop the policy's non-survivors
    val (dupHigh, ccCache) = nearDupPolicy match {
      case Greedy => (DedupApprox.jaccardJoin(exact, jaccardThreshold)
        .select(col("doc_b").as("doc_id")).distinct(), None)
      case Cluster =>
        val (clusters, cache) = Components.dedupClustersStaged(exact, jaccardThreshold)
        (clusters.filter(!col("is_canonical")).select(col("doc_id")), Some(cache))
    }
    val nearDeduped = persisted(exact.join(dupHigh, Seq("doc_id"), "left_anti"))
    stat("near_dedup", nearDeduped)
    // nearDeduped is materialized — the exact-dedup intermediate and the
    // Cluster policy's component-label cache (MEMORY_AND_DISK blocks from
    // the propagation loop) are no longer needed; without the latter
    // release, staged runs in a shared session accumulate one labels cache
    // per run
    if (collectStats) {
      exact.unpersist(blocking = false)
      ccCache.foreach(_.unpersist(blocking = false))
    }

    // 3. quality filter + enrichment (language, token counts)
    val quality = TextOps.textQuality(nearDeduped).select("doc_id", "quality_score")
    val curated = nearDeduped
      .join(quality, "doc_id")
      .filter(col("quality_score") >= minQuality)
      .withColumn("predicted_lang", TextFns.langId(TextFns.tokens(col("text"))))
      .withColumn("n_tokens", size(TextFns.tokens(col("text"))).cast("long"))
    stat("quality_filter", curated)

    (curated, stages.result(),
      // persisted intermediates the caller owns releasing: with stats the
      // near-dedup stage (the CC label cache is already released above);
      // without stats nothing is persisted by THIS method, but the Cluster
      // policy's CC loop persists internally regardless — hand its cache up
      // rather than leaking it into the session
      if (collectStats) Seq(nearDeduped) else ccCache.toSeq)
  }

  /** Incremental admission — the production shape of [[curateStaged]]
    * for a corpus that grows over time: a new batch is curated AGAINST
    * the committed corpus without recomputing it. Requires ids ordered
    * across batches (every seed doc_id < every batch doc_id — the
    * natural monotone-id ingest); then [[Greedy]]'s drop-the-higher-id
    * rule makes prior curation immune to later batches, so
    * `seed curation ∪ admitted batches ≡ whole-corpus curation` exactly.
    *
    * Per-batch cost is O(batch + candidates), never O(corpus):
    *  - exact dedup: within-batch hash group-by, then the Bloom-routed
    *    verification join against the seed's exact survivors
    *    ([[Dedup.bloomNewContent]] — the sketch routes, the 256-bit
    *    anti-join decides);
    *  - near-dup: [[graft.operators.DedupIndex.probeDelta]] against the
    *    persisted prefix index of the seed's EXACT survivors (the greedy
    *    pair universe — near-dup-dropped and quality-dropped seed docs
    *    still suppress batch twins, exactly like the batch form). The
    *    probe's candidate generator is the SAME exact prefix-filter
    *    scheme as the batch path's `jaccardJoin` (under the index's
    *    frozen shingle order), so the batch-recompute equivalence is
    *    deterministic, not LSH-recall-probabilistic; the index read is
    *    shingle-bucket partition-pruned, batch↔batch pairs come from the
    *    same probe;
    *  - quality/language/token enrichment: the identical narrow
    *    projections.
    * The caller extends the index with the batch's exact survivors
    * ([[graft.operators.DedupIndex.appendToIndex]]) so the NEXT batch
    * sees this one as corpus.
    */
  def admitBatch(spark: SparkSession, seedExact: DataFrame,
                 indexPath: String, batch: DataFrame,
                 jaccardThreshold: Double = 0.8,
                 minQuality: Double = 0.3): (DataFrame, DataFrame) =
    admitBatchWith(
      kept => Dedup.bloomNewContent(seedExact, kept, "text"),
      ex => graft.operators.DedupIndex
        .probeDelta(spark, indexPath, ex, jaccardThreshold),
      batch, minQuality)

  /** The admission pipeline with its two corpus-facing stages injected —
    * the seam [[graft.streaming.CuratedStore]] uses to swap the full
    * exact-table Bloom build for its persisted bloom + bucketed hash
    * index, and the plain-dir index probe for the manifest-resolved
    * fragment view, WITHOUT forking the admission semantics (within-batch
    * min-id exact dedup → `newContent` vs the corpus → drop the higher id
    * of every `probe` pair → quality gate + enrichment).
    *
    * `newContent(kept)` must return the subset of `kept` whose content is
    * absent from the committed corpus; `probe(batchExact)` the near-dup
    * pairs `(doc_a < doc_b)` with at least one side in `batchExact`.
    */
  def admitBatchWith(newContent: DataFrame => DataFrame,
                     probe: DataFrame => DataFrame,
                     batch: DataFrame,
                     minQuality: Double = 0.3): (DataFrame, DataFrame) = {
    // 1. exact dedup: min-id within the batch, then content new vs corpus
    val keepB = Dedup.exactByContent(batch, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val batchExact = newContent(batch.join(keepB, Seq("doc_id"), "left_semi"))
      .localCheckpoint(true) // consumed by the probe, the anti-join, and the caller's index append
    // 2. near-dup: a batch doc drops iff it is the HIGHER id of any
    //    exact-survivor pair — seed ids are all lower, batch↔batch pairs
    //    canonicalize doc_a < doc_b, so the drop set is just doc_b
    val dupHigh = probe(batchExact)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = batchExact.join(dupHigh, Seq("doc_id"), "left_anti")
    // 3. the same quality gate + enrichment as the batch form
    val quality = TextOps.textQuality(nearDeduped)
      .select("doc_id", "quality_score")
    val admitted = nearDeduped
      .join(quality, "doc_id")
      .filter(col("quality_score") >= minQuality)
      .withColumn("predicted_lang", TextFns.langId(TextFns.tokens(col("text"))))
      .withColumn("n_tokens", size(TextFns.tokens(col("text"))).cast("long"))
    (admitted, batchExact)
  }

  /** Curated corpus → model-ready tensors: vocabulary-encode every token
    * position and assign concat-and-chunk packs — the full
    * curate → encode → pack tail of a training-data pipeline in one
    * composition. Returns (token stream, pack assignments): the token
    * stream is `(doc_id, pos, token_id)` and joins to its pack via
    * `doc_id` (both sides carry deterministic keys, so the join is
    * reproducible anywhere).
    */
  def prepareTrainingData(curated: DataFrame, vocabSize: Int = 32768,
                          ctxTokens: Long = 2048,
                          shards: Int = 32): (DataFrame, DataFrame) =
    (TextOps.tokenIds(curated, vocabSize),
      TextOps.packDocuments(curated, ctxTokens, shards))

  /** Corpus-level rollup of the curated output. */
  def summary(curated: DataFrame): DataFrame =
    curated.groupBy(col("predicted_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality_score")), 4).as("avg_quality"))

  def run(spark: SparkSession, srcDir: String, outDir: String): Seq[CurationResult] = {
    val (curated, stages, staged) = curateStaged(Tables.documents(spark, srcDir))
    curated.write.mode(SaveMode.Overwrite).parquet(s"$outDir/curated_documents")
    // the write was the last consumer of the persisted near-dedup stage —
    // release exactly that intermediate, nothing else the session may cache
    staged.foreach(_.unpersist(blocking = false))
    summary(spark.read.parquet(s"$outDir/curated_documents"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/corpus_summary")
    stages
  }
}
