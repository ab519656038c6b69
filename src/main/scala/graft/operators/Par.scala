package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-heavy operators (optimization guide
  * §2.5 "input skew": one unsplittable input file pins the whole
  * downstream codegen-fused pipeline to one task).
  *
  * Parquet cannot be split below a row group, so a single-file,
  * single-row-group input — the shape of every sf fixture table, and of
  * any small reference/delta table in production — plans as ONE scan
  * partition. Whole-stage codegen then fuses the expensive per-row work
  * (shingling, MinHash/SimHash signatures, q-gram explosion, pairwise
  * cosine, bigram explosion) into that one task while the rest of the
  * cluster idles: the round-20 profile showed 1.5-3 s single-task stages
  * inside `doc_lm_perplexity`, `dedup_embedding` and the curation seed
  * while `local[32]` sat 97% idle.
  *
  * [[fanOutScan]] is the guide's fix — "repartition immediately after the
  * read" — made SCALE-ADAPTIVE: it fires only when the frame's planned
  * partition count is below the session's default parallelism, so on a
  * production 100-TB corpus (thousands of files, parallelism already
  * native) it is a provable no-op and no corpus-wide shuffle is ever
  * added. Round-robin (key-free) so no skew is introduced; row-to-
  * partition determinism under task retry comes from Spark's
  * sort-before-repartition (SPARK-23207, on by default). Every consumer
  * below is an aggregation/join keyed on deterministic columns, so the
  * repartition cannot change any query's result — only its parallelism.
  */
object Par {

  /** `df` repartitioned to the session default parallelism iff its planned
    * scan has fewer partitions; identity otherwise. Call it on the INPUT
    * side of CPU-heavy per-row work, before the first wide operator.
    */
  def fanOutScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // rdd.getNumPartitions only PLANS the frame (no job): for the
    // scan-rooted inputs this is called on, that is the file-split count
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
