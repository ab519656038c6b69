package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Ranked text retrieval over the documents table — Okapi BM25 (Robertson
  * et al., TREC-3; the scoring function behind Lucene/Elasticsearch
  * defaults), the lexical-search counterpart of the dense [[Ann]] path and
  * the standard first stage of RAG / decontamination-by-retrieval
  * pipelines over training corpora.
  *
  * Everything is expressed as joins + aggregates over a term-frequency
  * postings table, so the whole plan is shuffle-on-key and
  * whole-stage-codegen'd:
  *
  *  - postings `(doc_id, token, tf)` and doc lengths `(doc_id, dl)` are
  *    plain hash aggregates over the exploded corpus;
  *  - document frequency `df` is an aggregate over postings, immediately
  *    semi-joined to the (tiny) query vocabulary and broadcast — per-token
  *    idf never touches the big side;
  *  - candidate scoring joins ONLY the postings of query terms (the
  *    broadcast query-vocabulary join comes first, so non-matching
  *    postings are dropped before any wide join), then equi-joins doc
  *    lengths on `doc_id` — the one big-×-big shuffle, sized by candidate
  *    postings, not the corpus;
  *  - top-k per query uses the bounded [[graft.functions.TopKByScore]]
  *    aggregate (≤ k rows per query × partition on the wire), not a
  *    ranking window over every scored document.
  *
  * Scores are EXACT integers in micro-units: each per-term contribution
  * `idf(t) · tf-saturation(t, d)` is rounded to 6 decimals and cast to a
  * BIGINT of micro-units, and the per-document score is an integer sum of
  * those — so the result is independent of float summation order across
  * partitions AND engines (the per-term double math is a fixed expression
  * tree both engines evaluate identically, the same contract `tok_idf`
  * relies on; a raw double sum would hash-differ between Spark's and the
  * oracle's aggregation orders). Ties break on `doc_id` ascending, making
  * the full output deterministic.
  *
  * Query-side term frequency is deliberately ignored (each distinct query
  * token contributes once) — the common engine simplification for short
  * queries.
  */
object Retrieval {

  /** Okapi defaults (Lucene's `k1`/`b`). */
  val K1 = 1.2
  val B = 0.75

  /** Deterministic in-vocabulary demo workload for the fixture corpus. */
  val DefaultQueries: Seq[(Long, String)] = Seq(
    0L -> "spark join hash",
    1L -> "customer order merge",
    2L -> "slow scan filter vector")

  /** Top-`k` documents per query by BM25 over whitespace tokens of
    * `documents(doc_id, text)`. Output: `(q_id, doc_id, score_micro, rk)`
    * with `score_micro` = BM25 · 10⁶ as an exact BIGINT (see object doc).
    */
  def bm25TopK(documents: DataFrame, queries: Seq[(Long, String)],
               k: Int, k1: Double = K1, b: Double = B): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    val toks = documents.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))

    // corpus stats as a 1-row broadcast (the J3 scalar-subquery shape);
    // avgdl = exact BIGINT token total / exact BIGINT doc count, divided
    // once in double — both engines evaluate the identical two-long
    // division
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val qtok = queries.toDF("q_id", "qtext")
      .select(col("q_id"), explode(TextFns.tokens(col("qtext"))).as("token"))
      .distinct()
    // df must count over ALL postings (idf is a corpus statistic), but
    // only query-term rows are ever needed downstream: semi-join to the
    // query vocabulary straight away, leaving a ≤|query-vocab|-row table
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .join(broadcast(qtok.select("token").distinct()), "token")

    // dfq is ≤ |query vocab| rows but its subtree contains a corpus-wide
    // aggregate, so a broadcast() hint would carry no structural
    // boundedness evidence (HintPolicySpec); AQE broadcasts it at runtime
    // from its measured size instead — same final plan, policy-clean
    val terms = tf
      .join(broadcast(qtok), "token")
      .join(dfq, "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
    scoreTerms(terms, k, k1, b)
  }

  /** Shared scoring tail: `terms` carries `(q_id, doc_id, tf, df, dl,
    * n_docs, avgdl)`; emits the ranked `(q_id, doc_id, score_micro, rk)`.
    * Constants fold in-engine on both sides (never pre-computed in
    * Scala): `k1 + 1` etc. must be the same IEEE ops the oracle's SQL
    * literals produce, or micro-unit rounding can flip at boundaries.
    */
  private def scoreTerms(terms: DataFrame, k: Int,
                         k1: Double, b: Double): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val k1c = lit(k1)
    val bc = lit(b)
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * (k1c + lit(1.0))) /
      (col("tf") + k1c * (lit(1.0) - bc + bc * col("dl") / col("avgdl")))
    val scored = terms
      .select(col("q_id"), col("doc_id"),
        round(idf * tfn * lit(1000000.0), 0).cast("long").as("term_micro"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("term_micro")).as("score_micro"))
    // micro-unit scores are < 2^53, so the Double score in the bounded
    // top-k aggregate is still exact; rank = position in its total order
    scored.select(col("q_id"), col("doc_id"),
        col("score_micro").cast("double").as("s"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(k).toColumn.name("topk"))
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.id").as("doc_id"),
        col("e.score").cast("long").as("score_micro"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** RECIPROCAL-RANK FUSION of two ranked lists — the standard hybrid-
    * retrieval combiner (Cormack et al. SIGIR'09; every lexical+vector
    * "hybrid search" engine ships it): each list contributes
    * 1/(k₀ + rank) per item and the fused ranking orders by the sum.
    * Rank-based, so the two systems' incommensurable scores (BM25 micros
    * vs cosine) never need calibrating — exactly why RRF is the default
    * fusion. Scored in exact integer MICRO units via the half-up
    * [[graft.functions.FxMath.roundedDiv]] (1e6/(k₀+rk) for rk ≤ depth —
    * a small-integer division both engines replay bit-for-bit), ties by
    * doc_id.
    *
    * Inputs are `(q_id, doc_id, rk)` frames (any extra columns ignored);
    * output `(q_id, doc_id, rrf_micro, rk)`. Scale shape: the inputs are
    * ALREADY k-bounded per query (top-k lists), so the fusion is a
    * union + one map-side-combining sum + the bounded
    * [[graft.functions.TopKByScore]] ranking over ≤ 2·depth rows per
    * query — O(queries · depth), independent of corpus size; the corpus-
    * scale work lives in the upstream retrievers (persisted BM25 index,
    * IVF index), which this composes without modification.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame =
    rrfFuseWeighted(a, b, k, k0, wA = 1L, wB = 1L)

  /** [[rrfFuse]] with PER-SIDE INTEGER WEIGHTS — the production hybrid
    * knob (every hosted hybrid-search API exposes it): fused score =
    * `wA·RRF_a + wB·RRF_b`. Weights are exact longs multiplying the
    * integer micro terms, so the weighted form inherits the unweighted
    * one's bit-for-bit cross-engine replay (no float calibration enters
    * anywhere — a rational weight is just both weights scaled up).
    * Monotone at the extremes by construction: `wB = 0` reproduces side
    * a's ranking exactly (its items carry the only positive mass;
    * `RetrievalSpec` pins it), and symmetrically for `wA = 0`. Overflow
    * audit: w · 1e6 · 2·depth ≤ 1e6·1e6·100 ≪ 2^63 for any sane weight.
    * Same O(queries · depth) shape — weighting adds one multiply per
    * input row.
    */
  def rrfFuseWeighted(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60,
                      wA: Long = 1L, wB: Long = 1L): DataFrame = {
    require(wA >= 0 && wB >= 0 && (wA > 0 || wB > 0),
      s"fusion weights must be non-negative and not both zero; got ($wA, $wB)")
    require(wA <= 1000000L && wB <= 1000000L,
      s"fusion weights above 1e6 risk long overflow in the micro terms; got ($wA, $wB)")
    val spark = a.sparkSession
    import spark.implicits._
    val terms = a.select(col("q_id"), col("doc_id"), col("rk"))
      .withColumn("w", lit(wA))
      .unionByName(b.select(col("q_id"), col("doc_id"), col("rk"))
        .withColumn("w", lit(wB)))
      .select(col("q_id"), col("doc_id"),
        (col("w") * graft.functions.FxMath.roundedDiv(
          lit(1000000L), lit(k0.toLong) + col("rk"))).as("t"))
    terms.groupBy("q_id", "doc_id").agg(sum(col("t")).as("rrf_micro"))
      .select(col("q_id"), col("doc_id"),
        col("rrf_micro").cast("double").as("s"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(k).toColumn.name("topk"))
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.id").as("doc_id"),
        col("e.score").cast("long").as("rrf_micro"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Hybrid lexical+semantic retrieval: BM25 over `documents` fused with
    * brute-cosine over `embeddings` (query embedding = the q_id-th
    * corpus vector, item space = vec_id read as doc_id) by [[rrfFuse]].
    * `depth` rows per system feed the fusion, final top-`k` emitted. The
    * production swap-ins are drop-in: [[bm25TopKFromIndex]] for the
    * lexical side, [[Ann.ivfTopKWithCentroids]] for the semantic side —
    * both emit the same `(q_id, id, score, rk)` shape the fusion reads.
    */
  def hybridRrfTopK(documents: DataFrame, embeddings: DataFrame,
                    queries: Seq[(Long, String)], k: Int,
                    depth: Int = 10): DataFrame =
    rrfFuse(
      bm25TopK(documents, queries, depth),
      Ann.bruteTopK(embeddings, queries.size, depth)
        .withColumnRenamed("vec_id", "doc_id"),
      k)

  /** Token → index bucket: the partition key of the persisted postings.
    * xxhash64 is a deterministic Spark built-in, so the probe side can
    * recompute bucket ids for its query tokens and prune to them.
    */
  private def bucketOf(token: Column, numBuckets: Int): Column =
    pmod(xxhash64(token), lit(numBuckets.toLong))

  /** Persist the text index: tf postings and per-token df land
    * `partitionBy(bucket)` (bucket = hash of the token), doc lengths and
    * the 1-row corpus stats beside them — build once, query many. At
    * query time only the query tokens' buckets are READ (partition
    * pruning), so per-query index I/O is O(|query vocab| / numBuckets) of
    * the postings, never a corpus scan — the lexical analog of the IVF
    * index's probed-lists-only contract.
    *
    * BUCKET SIZING is what keeps that contract meaningful as the corpus
    * grows: with a FIXED bucket count C, a q-term probe reads q/C of the
    * postings — a constant fraction, i.e. a LINEAR corpus scan in
    * disguise once q ≳ C (the round-17 saturation finding on the 16-bucket
    * dedup index). The default therefore sizes C ≈ √(posting rows),
    * clamped to [[MinBuckets]]..[[MaxBuckets]]: per-bucket volume is then
    * O(√postings), so a q-term probe costs O(q·√postings) — SUBLINEAR in
    * the corpus at any fixed workload, and re-measured that way in
    * `TextIndexProbe` (BASELINE.md). Pass `numBuckets > 0` to pin a
    * layout explicitly; the chosen count self-describes in the stats
    * table either way, and appends inherit it.
    *
    * The bucketed writes `repartition(bucket)` first so each bucket's
    * rows land in one task → O(numBuckets) files total, not
    * numBuckets × shuffle-partitions.
    */
  val MinBuckets = 16
  val MaxBuckets = 4096

  def buildTextIndex(documents: DataFrame, path: String,
                     numBuckets: Int = 0): Unit = {
    val toks = documents.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist() // consumed by sizing count + postings write + df agg
    try {
      val buckets =
        if (numBuckets > 0) numBuckets
        else {
          val nPostings = tf.count()
          math.max(MinBuckets, math.min(MaxBuckets,
            math.ceil(math.sqrt(nPostings.toDouble)).toInt))
        }
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      // dl DENORMALIZED into every posting row (+8 bytes/posting): the
      // probe then needs NO doclen join — its one remaining O(corpus)
      // term — so probe I/O is strictly the pruned buckets + the 1-row
      // stats. doclen still lands standalone for appends' totals and any
      // length-profile consumer.
      tf.join(dl, "doc_id")
        .withColumn("bucket", bucketOf(col("token"), buckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
      tf.groupBy("token").agg(count(lit(1)).as("df"))
        .withColumn("bucket", bucketOf(col("token"), buckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/tokendf")
      dl.write.mode("overwrite").parquet(s"$path/doclen")
      // total_dl rides as an exact BIGINT so an APPEND can extend the
      // corpus totals without double drift: avgdl is always the SAME ieee
      // division of the same two longs, built or admitted-to
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        .withColumn("n_buckets", lit(buckets))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    } finally tf.unpersist(blocking = false)
  }

  /** ADMIT a batch of NEW documents into a persisted [[buildTextIndex]]
    * index — the index-lifecycle other half ([[Ann.appendToIvfIndex]]'s
    * shape for the lexical index). O(batch) work, never a rebuild:
    *
    *  - the batch's tf postings APPEND into the existing
    *    bucket-partitioned layout (new files, no rewrite);
    *  - per-token document frequencies land as PARTIAL count rows in the
    *    same bucketed `tokendf` dirs — the read side sums partials after
    *    bucket pruning (a ≤|query-vocab × appends| aggregate), so no
    *    committed dir is ever read-modify-written;
    *  - doc lengths append;
    *  - the 1-row corpus stats rewrite from their own prior EXACT totals
    *    (`n_docs`/`total_dl` BIGINTs) plus the batch's — `avgdl` stays
    *    bit-identical to a from-scratch build of the full corpus.
    *
    * Contract (same as the IVF/LSH admissions): batch `doc_id`s are NEW —
    * re-admitting an indexed document would double its postings. Single
    * writer; a crash between the appends leaves a partially-admitted
    * batch (re-index to repair) — the plain-dir index trades the manifest
    * tables' atomic flip for zero-copy appends, like the IVF layout.
    */
  def appendToTextIndex(documents: DataFrame, path: String): Unit = {
    val spark = documents.sparkSession
    val statsAll = spark.read.parquet(s"$path/stats")
    val prior = statsAll.select("n_docs", "total_dl", "n_buckets").head()
    val numBuckets = prior.getInt(2)
    val toks = documents.select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // batch totals FIRST: an empty batch (or one whose documents all
    // tokenize to nothing — the build path records no doclen row for
    // those either) is a clean no-op, not a null-sum NPE after the
    // appends already ran
    val batch = dl.agg(count(lit(1)).as("bn"), sum(col("dl")).as("bdl")).head()
    if (batch.getLong(0) == 0L) return
    tf.join(dl, "doc_id") // same denormalized posting shape as the build
      .withColumn("bucket", bucketOf(col("token"), numBuckets))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/postings")
    tf.groupBy("token").agg(count(lit(1)).as("df"))
      .withColumn("bucket", bucketOf(col("token"), numBuckets))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/tokendf")
    dl.write.mode("append").parquet(s"$path/doclen")
    val nDocs = prior.getLong(0) + batch.getLong(0)
    val totalDl = prior.getLong(1) + batch.getLong(1)
    import spark.implicits._
    Seq((nDocs, totalDl)).toDF("n_docs", "total_dl")
      .select(col("n_docs"), col("total_dl"),
        // the identical two-long ieee division buildTextIndex performs
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"),
        lit(numBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a persisted [[buildTextIndex]] index. The
    * postings and df scans are filtered to the query tokens' buckets — a
    * partition-column `IN` list resolved at planning time — then
    * token-equi-joined to the query vocabulary. Answers identically to
    * [[bm25TopK]] over the same corpus (same tokenizer, same stats, same
    * integer-exact scoring).
    */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: Seq[(Long, String)], k: Int,
                        k1: Double = K1, b: Double = B): DataFrame = {
    import spark.implicits._
    val qtok = queries.toDF("q_id", "qtext")
      .select(col("q_id"), explode(TextFns.tokens(col("qtext"))).as("token"))
      .distinct()
    // the index is self-describing: numBuckets rides in the 1-row stats
    // table, so the query side never has to be told it
    val statsAll = spark.read.parquet(s"$path/stats")
    val numBuckets = statsAll.select("n_buckets").head().getInt(0)
    val stats = statsAll.select("n_docs", "avgdl")
    // bucket ids of the query tokens: |query vocab| longs — driver-tiny,
    // same contract as the IVF probed-bucket collect
    val buckets = qtok
      .select(bucketOf(col("token"), numBuckets).as("bucket"))
      .distinct().as[Long].collect()
    // postings carry dl denormalized (see buildTextIndex), so the probe's
    // reads are EXACTLY the pruned buckets + the 1-row stats — no
    // O(corpus) doclen join anywhere in the plan
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets.toSeq: _*))
    // sum PARTIAL df rows (one per build/admission that saw the token) —
    // a ≤|query vocab × appends|-row aggregate after pruning
    val dfq = spark.read.parquet(s"$path/tokendf")
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .join(broadcast(qtok.select("token").distinct()), "token")
      .groupBy("token").agg(sum(col("df")).as("df"))
    val terms = postings
      .join(broadcast(qtok), "token")
      .join(dfq, "token")
      // stats is ONE row by construction, but a parquet scan carries no
      // structural boundedness evidence (the HintPolicySpec rule — same
      // reasoning as dfq in bm25TopK): unhinted, the planner's measured
      // size picks the broadcast nested-loop join on its own
      .crossJoin(stats)
    scoreTerms(terms, k, k1, b)
  }
}
