package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup}

/** Dev-only sf1-equivalent probe of the FLAGSHIP path — the 10× point the
  * sf fixtures stop short of (sf0.1 is the largest driver-generated dir;
  * `/root/testdata` is read-only, so the scaled inputs are derived here):
  *
  *  - `events@10×` = ten copies of the sf0.1 events with event_id /
  *    user_id / ts shifted per copy (disjoint ids, +1 day per copy) —
  *    1M rows, the ≈sf1 regime, with the dedup/partition texture intact;
  *  - `documents@10×` = ten copies of the sf0.1 documents with doc_id
  *    shifted and EVERY token prefixed by the copy tag — cross-copy
  *    shingles never collide, so the near-dup structure is exactly ten
  *    independent copies of the sf0.1 structure (pair volume scales
  *    linearly, not quadratically — planted, not accidental).
  *
  * Stages measured (each from a parquet round trip, so Spark's cache
  * manager can't substitute an InMemoryRelation for the input scan):
  *
  *  1. `fact_dedup` — keep-latest dedup of 1M events (count action);
  *  2. `pipeline_star_disk` — the full dependency-ordered pipeline
  *     written to disk, then the trailing-7-day partition-pruned read;
  *  3. `dedup_clusters` — MinHash-LSH pairs → transitive min-label
  *     clusters over 50k docs.
  *
  * Expectation at 10×: stage 1-2 near-linear (hash-agg + shuffle on key,
  * partition counts unchanged), stage 3 near-linear BY CONSTRUCTION of
  * the corpus (see above). Results pinned in BASELINE.md.
  *
  * Run: `sbt "Test/runMain graft.StarScaleProbe [copies] [stages]"`
  * (default 10, all stages). `stages` is a comma list of
  * `dedup,star,clusters,curation,lm` — the 30× spot check runs just the
  * two linear-by-construction stages (`curation,lm`) whose 100-TB claims
  * the extra point strengthens, without paying for the rest at 3M rows.
  */
object StarScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val stages = args.drop(1).headOption.map(_.split(',').toSet)
    def enabled(name: String): Boolean = stages.forall(_.contains(name))
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_probe"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- scaled inputs (build cost reported separately, not a stage) ----
    timed("build events@Nx") {
      val e = graft.sources.Tables.events(spark, src)
      val scaled = spark.range(copies).crossJoin(e).select(
        (col("event_id") + col("id") * 1000000000L).as("event_id"),
        expr("timestampadd(DAY, id, ts)").as("ts"),
        (col("user_id") + col("id") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      scaled.write.mode("overwrite").parquet(s"$root/in/events.parquet")
    }
    timed("build documents@Nx") {
      val d = spark.read.parquet(s"$src/documents.parquet")
      val scaled = spark.range(copies).crossJoin(d).select(
        (col("doc_id") + col("id") * 1000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(col("id").cast("string"), lit("c"), t)), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      scaled.write.mode("overwrite").parquet(s"$root/in/documents.parquet")
    }

    val dir = s"$root/in"
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    println(s"[probe] inputs: $nEvents events, $nDocs documents (copies=$copies)")

    // stage 1: keep-latest dedup of the scaled events
    val deduped = if (!enabled("dedup")) -1L else timed("fact_dedup") {
      Dedup.latestEvents(graft.sources.Tables.events(spark, dir)).count()
    }
    // stage 2: the full pipeline to disk + the pruned trailing-week read
    val week = if (!enabled("star")) -1L else timed("pipeline_star_disk") {
      val out = s"$root/star"
      graft.pipeline.Pipeline.run(spark, dir, out)
      val dayFmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE
      val maxKey = new java.io.File(s"$out/fact_events_star").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("date_key="))
        .map(_.getName.stripPrefix("date_key=")).max
      val cutoff = java.time.LocalDate.parse(maxKey, dayFmt)
        .minusDays(6).format(dayFmt).toLong
      spark.read.parquet(s"$out/fact_events_star")
        .filter(col("date_key") >= cutoff).count()
    }
    // stage 3: near-dup clusters over the scaled corpus
    val clusters = if (!enabled("clusters")) -1L else timed("dedup_clusters") {
      Components.dedupClusters(
        spark.read.parquet(s"$dir/documents.parquet"), 0.7).count()
    }
    // stage 4: the END-TO-END curation pipeline to disk (exact dedup →
    // prefix-filtered Jaccard prune → quality gate → enrichment) — the
    // curation_disk flagship at Nx. Near-dup volume is linear by the
    // corpus construction, so the stage should scale like dedup_clusters.
    val curated = if (!enabled("curation")) -1L else timed("curation_disk") {
      graft.pipeline.Curation.run(spark, dir, s"$root/curation")
      spark.read.parquet(s"$root/curation/curated_documents").count()
    }
    // stage 5: CCNet-style bigram-LM scoring — model trained on the
    // deterministic half, EVERY doc scored. Model tables stay
    // vocab-bounded broadcast sides, so cost should track the corpus
    // token volume linearly (LmProbe pins flat per-doc cost; this pins
    // the 10× wall-clock).
    val scored = if (!enabled("lm")) -1L else timed("doc_lm_perplexity") {
      val docs = graft.sources.Tables.documents(spark, dir)
      graft.operators.TextOps.lmPerplexity(
        graft.operators.TextOps.deterministicSample(docs, "doc_id", "8000"),
        docs).count()
    }
    println(s"[probe] results: deduped=$deduped, week_rows=$week, " +
      s"cluster_rows=$clusters, curated=$curated, lm_scored=$scored")
  }
}
