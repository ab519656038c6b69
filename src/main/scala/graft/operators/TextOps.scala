package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document-level text analysis for training-data curation (BASELINE.json
  * north_star): statistics, quality scoring, language ID, fingerprints.
  * All single-pass narrow projections over the documents scan — no shuffle,
  * fully codegen'd, so they run at scan speed on any corpus size.
  */
object TextOps {

  /** Per-document token statistics (whitespace + BPE-ish tokenizations). */
  def textStats(documents: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_text"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      array_max(transform(toks, t => length(t))).cast("long").as("max_token_len"),
      graft.functions.FxMath.ratio(
        length(regexp_replace(col("text"), "\\s", "")).cast("long"),
        size(toks).cast("long"), 4).as("avg_token_len"),
      size(TextFns.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
  }

  /** Quality scoring: stopword ratio and type-token ratio composed into a
    * single score — the classic cheap quality filters for pretraining data.
    * All three outputs are integer-exact rationals rounded via FxMath:
    * quality = ttr·(1−stop) ≡ distinct·(n−stops)/n², so no double
    * arithmetic ever touches a rounding boundary (the sf0.1 audit caught
    * round(double,4) flipping 0.49875 differently per engine).
    */
  def textQuality(documents: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = TextFns.stopwordCount(toks, Seq("the", "a")).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    documents.select(
      col("doc_id"),
      graft.functions.FxMath.ratio(nStop, nTok, 4).as("stop_ratio"),
      graft.functions.FxMath.ratio(nDist, nTok, 4).as("ttr"),
      graft.functions.FxMath.ratio(nDist * (nTok - nStop), nTok * nTok, 4)
        .as("quality_score"))
  }

  /** Language-ID heuristic + agreement with the labeled `lang` column. */
  def langId(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      TextFns.langId(TextFns.tokens(col("text"))).as("predicted_lang"))

  /** Content fingerprints: order-independent bag-of-words sha256 and the
    * order-sensitive polynomial rolling hash over the raw text.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      TextFns.bowFingerprint(col("text")).as("bow_fingerprint"),
      TextFns.rollingHash(col("text")).as("rolling_hash"))

  /** Corpus token-count quantiles (p50/p90/p99) — the length profile that
    * drives context-window and packing decisions for a training mix. Exact
    * interpolated percentile (Catalyst `percentile`): one aggregation whose
    * partial state is a per-partition digest, merged on the driver — no
    * global sort.
    *
    * SCALE CAVEAT: exact `percentile` buffers a value→count map per group;
    * on 100 TB of high-cardinality doubles that buffer is an executor-OOM
    * risk. This exact form exists as the ORACLE (cross-engine
    * hash-checkable vs DuckDB); the scale default is
    * [[tokenQuantilesSketch]], whose state is a fixed-size rank sketch.
    */
  def tokenQuantiles(documents: DataFrame): DataFrame =
    documents
      .select(size(TextFns.tokens(col("text"))).cast("double").as("n_tokens"))
      .agg(expr("percentile(n_tokens, array(0.5D, 0.9D, 0.99D))").as("qs"))
      .select(
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p90"),
        round(element_at(col("qs"), 3), 4).as("p99"))

  /** [[tokenQuantiles]]' 100-TB form: `approx_percentile` (a KLL-style rank
    * sketch) whose aggregation state is bounded by the accuracy parameter —
    * O(accuracy) per partition regardless of corpus size or value
    * cardinality, vs exact `percentile`'s per-value count map. Same output
    * schema; rank error ≤ n/accuracy is gated against the exact result in
    * `PropertySpec`, and [[tokenQuantilesSketchChecked]] carries the same
    * bound as a cross-engine-adjudicable certificate (the raw estimates
    * themselves have no oracle — sketch internals differ between engines
    * by design).
    */
  /** [[tokenQuantilesSketch]]'s REPLAYABLE companion: a deterministic
    * bottom-k-by-hash sample of per-doc token counts + exact interpolated
    * percentiles over the sample — O(k) aggregation state like the rank
    * sketch, but the sampled subset (and thus the estimate) is exactly
    * reproducible in DuckDB (`row_number() OVER (ORDER BY h, n) <= k`),
    * so this form carries a hash-match oracle where the KLL black box
    * cannot (see [[graft.functions.expr.Sketches]]). Sampling is over
    * distinct (hash, count) pairs; doc_id is injective so the
    * distinction is vacuous here.
    */
  def tokenQuantilesSample(documents: DataFrame, k: Int = 256): DataFrame = {
    val sk = graft.functions.expr.Sketches
    documents
      .select(sk.mhash61(col("doc_id")).as("h"),
        size(TextFns.tokens(col("text"))).cast("double").as("n_tokens"))
      .agg(sk.bottomKSample(col("h"), col("n_tokens"), k).as("sample"))
      .select(explode(col("sample")).as("n"))
      .agg(expr("percentile(n, array(0.5D, 0.9D, 0.99D))").as("qs"))
      .select(
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p90"),
        round(element_at(col("qs"), 3), 4).as("p99"))
  }

  def tokenQuantilesSketch(documents: DataFrame, accuracy: Int = 10000): DataFrame =
    documents
      .select(size(TextFns.tokens(col("text"))).cast("double").as("n_tokens"))
      .agg(expr(s"approx_percentile(n_tokens, array(0.5D, 0.9D, 0.99D), $accuracy)").as("qs"))
      .select(
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p90"),
        round(element_at(col("qs"), 3), 4).as("p99"))

  /** [[tokenQuantilesSketch]]'s DRIVER-ADJUDICABLE form: instead of the raw
    * KLL estimates (a black box no other engine replays), emit per target
    * quantile a CERTIFICATE that the estimate honors the sketch's rank-error
    * contract — `within_bound` = does `[p−ε, p+ε]` (ε = 1/accuracy + 1/n)
    * intersect the estimate's realized rank interval `[count(<v)/n,
    * count(≤v)/n]`? (The interval, not a point rank, because token counts
    * are discrete and heavily tied — same tie-run reasoning as the
    * `PropertySpec` gate, here computed distributed.) A cross-engine oracle
    * recomputes `n_docs` and asserts the booleans TRUE without ever seeing
    * the sketch internals.
    *
    * Scale shape: pass 1 is the O(accuracy)-state sketch agg; pass 2 ranks
    * the three estimates via one conditional-count hash agg against a
    * 3-row broadcast — no per-value state, no sort.
    */
  def tokenQuantilesSketchChecked(documents: DataFrame,
      accuracy: Int = 10000): DataFrame = {
    val lens = documents
      .select(size(TextFns.tokens(col("text"))).cast("double").as("n_tokens"))
    val probes = lens
      .agg(
        expr(s"approx_percentile(n_tokens, array(0.5D, 0.9D, 0.99D), $accuracy)")
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("n"), explode(arrays_zip(
        array(lit(0.5d), lit(0.9d), lit(0.99d)).as("p"),
        col("qs").as("est"))).as("z"))
      .select(col("n"), col("z.p").as("p"), col("z.est").as("est"))
    lens.crossJoin(broadcast(probes))
      .groupBy(col("p"), col("est"), col("n"))
      .agg(
        sum(when(col("n_tokens") < col("est"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("n_tokens") <= col("est"), 1L).otherwise(0L)).as("hi"))
      .select(
        col("p"),
        col("n").as("n_docs"),
        {
          val eps = lit(1.0 / accuracy) + lit(1.0) / col("n")
          ((col("lo") / col("n") - eps <= col("p")) &&
            (col("p") <= col("hi") / col("n") + eps)).as("within_bound")
        })
  }

  /** Per-document quality decile — stratification for curriculum/mix
    * construction. Scale shape: decile BOUNDARIES are one exact-percentile
    * aggregate (9 doubles) broadcast back into a narrow projection; the
    * naive `ntile(10) OVER (ORDER BY score)` would funnel the corpus
    * through a single-partition sort.
    */
  def qualityDeciles(documents: DataFrame): DataFrame = {
    val q = textQuality(documents).select(col("doc_id"), col("quality_score"))
    val bounds = q.agg(
      expr("percentile(quality_score, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))")
        .as("bnds"))
    q.crossJoin(broadcast(bounds))
      .select(col("doc_id"),
        (size(filter(col("bnds"), b => b <= col("quality_score"))) + 1)
          .cast("long").as("decile"))
  }

  /** Deterministic content-addressed sampling: keep rows whose md5(key)
    * falls under a hex-prefix threshold (e.g. "199a" ≈ 10%). Reproducible
    * across engines, cluster sizes, and reruns — unlike seeded `rand()`,
    * which is partitioning-dependent — and requires no shuffle at all.
    */
  def deterministicSample(df: DataFrame, keyCol: String, hexThreshold: String): DataFrame =
    df.filter(substring(md5(col(keyCol).cast("string")), 1, hexThreshold.length) < hexThreshold)

  /** Weighted priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007):
    * a size-k sample whose inclusion probability tracks a per-row weight —
    * here the document's token count, the "sample long documents
    * proportionally more" knob a training-mix pipeline reaches for when a
    * uniform row sample would under-represent the tokens that actually
    * feed the model. Each row gets priority q = w/u for uniform u; the
    * top-k priorities are the sample and the (k+1)-th is the threshold τ
    * that makes subset-sum estimation unbiased (est = max(w, τ): summing
    * `est_weight` over any sampled subset estimates that subset's true
    * total weight).
    *
    * Determinism: u comes from the engine's replayable
    * [[graft.functions.expr.Sketches.mhash61]] (doc_id ↦ [1, 2⁶¹−1]), and
    * the sort key is the INTEGER-QUANTIZED inverse priority
    * `key = h div w` (ascending key ⇔ descending q; ~15 significant
    * digits survive the quantization, ties broken by doc_id), so every
    * comparison — and τ itself, `M div key₍ₖ₊₁₎` — stays in BIGINT and
    * DuckDB replays sample and estimator bit-for-bit. Execution is one
    * narrow projection into a bounded TakeOrdered(k+1) — per-partition
    * top-k then an O(k) merge, no global sort, nothing wider than O(k)
    * leaves the executors.
    */
  def weightedPrioritySample(documents: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val M = graft.functions.expr.Sketches.M
    // token count ≥ 1 always (an empty text still splits to one token),
    // so the quantized key h div w is well-defined and ≥ 0
    val keyed = documents.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("weight"),
      graft.functions.expr.Sketches.mhash61(col("doc_id")).as("h"))
      .select(col("doc_id"), col("weight"),
        expr("h div weight").as("priority_key"))
    val top = keyed.orderBy(col("priority_key"), col("doc_id")).limit(k + 1)
    val ranked = top.withColumn("rn", row_number().over(
      Window.orderBy(col("priority_key"), col("doc_id"))))
    // τ from the (k+1)-th row; absent when the table has ≤ k rows, in
    // which case every row is sampled and its estimate is its own weight
    val tau = ranked.agg(
      max(when(col("rn") === k + 1, col("priority_key"))).as("tau0"))
    ranked.filter(col("rn") <= k).crossJoin(broadcast(tau)) // 1-row agg
      .select(col("doc_id"), col("weight"), col("priority_key"),
        when(col("tau0").isNull, col("weight"))
          .otherwise(greatest(col("weight"),
            expr(s"${M}L div greatest(tau0, 1L)"))).as("est_weight"))
  }

  /** Deterministic STRATIFIED sampling: per-stratum keep rates (e.g.
    * down-sample over-represented languages when composing a training mix),
    * implemented as the same content-addressed md5 hex-prefix threshold as
    * [[deterministicSample]] but with the threshold chosen per stratum.
    * Strata not in `rates` are dropped (rate 0). Reproducible across
    * engines, cluster sizes, and reruns; zero shuffle — the stratum
    * thresholds compile into a narrow CASE projection.
    *
    * `rates` values are hex-prefix thresholds out of 0x10000 (e.g. 0.1 →
    * keep md5 prefixes below round(0.1·65536) = "1999"); rate 1.0 keeps all.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val prefix = substring(md5(col(keyCol).cast("string")), 1, 4)
    def hexThreshold(r: Double): String = {
      val v = math.round(r * 65536)
      // rate 1.0 rounds to 0x10000, which sorts BELOW "ffff" as a string —
      // use a sentinel above every hex prefix instead
      if (v >= 65536L) "g" else f"$v%04x"
    }
    val threshold = rates.foldLeft(lit(null).cast("string")) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(prefix < threshold)
  }

  /** Leakage-safe train/val/test split: the split is a pure function of a
    * GROUP key, never of the row, so every row sharing the key lands in
    * the same split. Splitting documents row-wise leaks — near-duplicates
    * and same-source shards of one crawl domain straddle the boundary and
    * the eval set stops measuring generalization — so the unit of
    * assignment must be the leakage equivalence class (here the `source`
    * domain; after [[graft.operators.Components]] clustering, the
    * near-dup cluster id is the stronger key).
    *
    * Mechanics: the first 4 hex chars of md5(group) partition [0, 0x10000)
    * by the cumulative fractions — deterministic, data-independent (adding
    * documents never moves an EXISTING group's split, the property that
    * keeps yesterday's eval set valid after today's crawl lands), and
    * replayable by any engine with md5. One narrow projection, no shuffle,
    * no state: the 100 TB form is exactly this expression in the scan.
    * Realized fractions track the requested ones only in expectation OVER
    * GROUPS (a heavy domain drags its whole mass with it — inherent to
    * leakage-safe splitting, not a defect of the hash).
    */
  def groupSplit(df: DataFrame, groupCol: String,
                 trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac > 0 && valFrac > 0 && trainFrac + valFrac < 1.0,
      "fractions must be positive and leave room for the test split")
    def bound(cum: Double): String = f"${math.round(cum * 65536)}%04x"
    val prefix = substring(md5(col(groupCol).cast("string")), 1, 4)
    df.withColumn("split",
      when(prefix < bound(trainFrac), lit("train"))
        .when(prefix < bound(trainFrac + valFrac), lit("val"))
        .otherwise(lit("test")))
  }

  /** Token share per language — the training-mix composition table. Two
    * hash aggregations (per-lang, then a 1-row corpus total broadcast back);
    * integer token sums stay exact so the share division is bit-stable.
    */
  def langTokenMix(documents: DataFrame): DataFrame = {
    val perLang = documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextFns.tokens(col("text"))).cast("long")).as("total_tokens"))
    val total = perLang.agg(sum(col("total_tokens")).as("corpus_tokens"))
    perLang.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        graft.functions.FxMath.ratio(col("total_tokens"), col("corpus_tokens"), 6)
          .as("token_share"))
  }

  /** Document-frequency + smoothed IDF per token (df ≥ `minDf`): the
    * vocabulary statistics behind TF-IDF quality filters and rare-token
    * pruning. Shuffle is bounded by distinct tokens (map-side partial
    * counts); corpus size joins in as a broadcast 1-row aggregate.
    */
  def tokenIdf(documents: DataFrame, minDf: Long = 2L): DataFrame = {
    val tokDf = documents
      .select(explode(array_distinct(TextFns.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val total = documents.agg(count(lit(1)).as("n_docs"))
    tokDf.crossJoin(broadcast(total))
      .select(col("token"), col("df"),
        round(log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6)
          .as("idf"))
  }

  /** Greedy concat-and-chunk sequence packing — the standard pretraining
    * batching shape: documents are concatenated in a deterministic order and
    * cut into fixed `ctxTokens` context windows; each doc is tagged with the
    * pack its first token lands in and its token offset within the stream.
    *
    * Scale shape: the running token sum is computed per SHARD
    * (`doc_id % shards`), so the window is hash-partitioned across
    * executors — packing an unbounded corpus never funnels through the
    * single-partition global cumsum the naive form would use. Shards are
    * independent pack streams (exactly how production packing runs per input
    * shard); `(shard, pack_id)` is the global pack key. Everything is
    * integer arithmetic on a deterministic order, so pack assignments are
    * reproducible across engines, partitionings, and reruns.
    */
  def packDocuments(documents: DataFrame, ctxTokens: Long = 2048,
                    shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    documents
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id",
        call_function("div", col("start_tok"), lit(ctxTokens)))
      .select("doc_id", "shard", "n_tokens", "start_tok", "pack_id")
  }

  /** GLOBAL sequence packing — the single-token-stream companion of
    * [[packDocuments]]: every document gets its exclusive offset
    * (`start_tok`) in ONE corpus-wide token stream ordered by `doc_id`,
    * and `shard_id = start_tok / tokensPerShard` cuts the stream into
    * aligned token-budget shards — the training-export layout where shard
    * boundaries follow a GLOBAL token budget, not a per-shard one. The
    * naive form — `sum() OVER (ORDER BY doc_id)` with no PARTITION BY —
    * is the canonical scale-killer: Spark plans it as one single-partition
    * window sort of the whole corpus. This is the distributed BLOCK
    * PREFIX SUM instead: a monotone block id (doc_id range-mapped over
    * `nBlocks` blocks), per-block token totals (one map-side-combining
    * aggregate, `nBlocks` rows to the driver), exclusive block offsets
    * broadcast back, and a per-BLOCK running-sum window that parallelizes
    * across blocks. Driver state is O(nBlocks) longs; at 100 TB, raise
    * `nBlocks` to ~10× the cluster's cores so each block's window sort
    * fits an executor — the two-level scan/offset composition itself is
    * depth-fixed and scale-free.
    */
  def packGlobal(documents: DataFrame, tokensPerShard: Long = 1L << 16,
                 nBlocks: Int = 64): DataFrame = {
    require(tokensPerShard > 0 && nBlocks > 0,
      "need a positive token budget and block count")
    val spark = documents.sparkSession
    val t = documents.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    val bounds = t.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0))
      return t.withColumn("start_tok", lit(0L))
        .withColumn("shard_id", lit(0L))
        .select("doc_id", "n_tokens", "start_tok", "shard_id")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    require(hi - lo < Long.MaxValue / nBlocks,
      s"doc_id span ${hi - lo} would overflow the block mapping")
    // monotone id → block mapping: block order == id order is what makes
    // per-block exclusive offsets compose into the global prefix
    val blocked = t.withColumn("block",
      call_function("div", (col("doc_id") - lit(lo)) * lit(nBlocks.toLong),
        lit(hi - lo + 1)))
    val totals = blocked.groupBy(col("block"))
      .agg(sum(col("n_tokens")).as("tok")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.foldLeft((0L, List.empty[(Long, Long)])) {
      case ((acc, out), (b, tok)) => (acc + tok, (b, acc) :: out)
    }._2.reverse
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("block", "block_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    blocked.join(offDf, "block")
      .withColumn("start_tok",
        col("block_off") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard_id",
        call_function("div", col("start_tok"), lit(tokensPerShard)))
      .select("doc_id", "n_tokens", "start_tok", "shard_id")
  }

  /** Overlapping document chunking — the long-document splitting step
    * (context-window training slices, RAG passages): token windows of
    * `chunkTokens` starting every `chunkTokens − overlapTokens`, the final
    * window clamped to the tail. One narrow generate per doc (bounded
    * fan-out ⌈n/stride⌉), zero shuffle; `(doc_id, chunk_id)` is the stable
    * chunk key. Distinct from [[packDocuments]], which CONCATENATES short
    * docs; chunking SPLITS long ones.
    */
  def chunkDocuments(documents: DataFrame, chunkTokens: Int,
                     overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlap < chunk")
    val stride = chunkTokens - overlapTokens
    documents
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        col("toks"),
        posexplode(sequence(lit(0L), size(col("toks")).cast("long") - 1,
          lit(stride.toLong))).as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok"),
        least(lit(chunkTokens.toLong), col("n_tokens") - col("start_tok"))
          .as("chunk_len"),
        array_join(slice(col("toks"), (col("start_tok") + 1).cast("int"),
          lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** Vocabulary encoding: build a frequency-ranked vocab of the top
    * `vocabSize` tokens (ids 1..V in (count desc, token) order — total, so
    * the id assignment is deterministic across engines and reruns) and map
    * every token position to its id, 0 for out-of-vocabulary. Output is the
    * exploded `(doc_id, pos, token_id)` stream — the form token-id tensors
    * are assembled from (and the cross-engine-comparable one; array columns
    * are a hash-compare hazard).
    *
    * Scale shape: the vocab is an aggregation bounded by distinct tokens,
    * topped via `orderBy.limit` (TakeOrderedAndProject — per-partition
    * top-V + V-row merge, no global sort). Ids are assigned on the DRIVER
    * over those ≤ `vocabSize` rows — the vocab is model state, exactly like
    * k-means centroids — then broadcast back for a narrow map-side encode
    * join against the exploded token stream. No partition-less window
    * anywhere.
    */
  def tokenIds(documents: DataFrame, vocabSize: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .as[(String, Long)].collect()
      .sortBy { case (tok, n) => (-n, tok) }
    val vocab = top.zipWithIndex
      .map { case ((tok, _), i) => (tok, (i + 1).toLong) }.toSeq
      .toDF("tok", "token_id")
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** Per-document repetition metrics (the Gopher-style repetitious-text
    * filters): the fraction of bigram occurrences that are repeats and the
    * share held by the single most-frequent bigram. Highly repetitive
    * machine-generated or boilerplate text scores high on both and is the
    * first thing a pretraining quality gate drops.
    *
    * Scale shape: the statistics are per-document and each document is one
    * row, so this is a pure narrow projection — zero shuffle. The
    * [[graft.functions.expr.BigramStats]] expression accumulates total /
    * distinct / max bigram counts in a single O(tokens) hash-map pass per
    * row (NOT the O(tokens²) array-HOF count a naive per-row rewrite would
    * use), with memory bounded by the document's own distinct-bigram count
    * — the same order as the row the scan already materialized. The
    * previous two-level hash aggregation keyed `(doc_id, bigram)` shuffled
    * every bigram occurrence in the corpus to recompute what each row
    * already knows; at 100 TB that shuffle IS the query cost, and it buys
    * nothing. Ratios are integer-exact (FxMath). Documents with fewer than
    * two tokens have no bigrams and are not emitted.
    */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val stats = graft.functions.expr.VectorExpressions.bigramStats(col("text"))
    documents
      .select(col("doc_id"), stats.as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"),
        col("s.n_bigrams").as("n_bigrams"),
        col("s.n_distinct").as("n_distinct_bigrams"),
        graft.functions.FxMath.ratio(
          col("s.n_bigrams") - col("s.n_distinct"), col("s.n_bigrams"), 4)
          .as("dup_bigram_frac"),
        graft.functions.FxMath.ratio(col("s.top"), col("s.n_bigrams"), 4)
          .as("top_bigram_frac"))
  }

  /** Benchmark-contamination scan: which training documents share word
    * n-grams with a held-out evaluation split (here the deterministic
    * `doc_id % evalMod == 0` subset — in production, the benchmark corpus).
    * Returns one row per contaminated (train, eval) pair with the count of
    * shared distinct n-grams — the evidence table a decontamination pass
    * filters on.
    *
    * Scale shape: an inverted-index equi-join on the n-gram — the eval side
    * is tiny (benchmarks are ≪ corpus) and broadcasts, so the corpus-side
    * shingle stream never shuffles; nothing resembling an all-pairs
    * comparison exists. Shingles are DISTINCT per doc (the shared-count is
    * over distinct n-grams), documents shorter than `n` tokens contribute
    * their whole text as one shingle.
    *
    * The "eval side is tiny" contract is ENFORCED, not assumed: the call
    * refuses eval splits beyond `maxEvalNgrams` exploded n-grams (the same
    * input fence as `Ann.embeddingNearDup`'s row cap — the guard job scans
    * at most cap+1 rows). After the guard passes, a `limit(maxEvalNgrams)`
    * is stacked on the eval side: provably a pass-through (the guard
    * established rows ≤ cap), it exists to put the row bound IN THE PLAN,
    * so the broadcast hint's boundedness is plan-structural (HintPolicySpec
    * verifies it mechanically) rather than a comment-level contract. The
    * default cap keeps the broadcast build ≤ ~10s of MB — a real benchmark
    * suite (thousands of docs × hundreds of n-grams) sits well inside it.
    */
  def contamination(documents: DataFrame, n: Int = 5,
                    evalMod: Long = 10L,
                    maxEvalNgrams: Int = 1000000): DataFrame = {
    val sh = graft.functions.expr.VectorExpressions.shingles(col("text"), n)
    val exploded = documents.select(col("doc_id"), explode(sh).as("ngram"))
    val evalRaw = exploded.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
      .select(col("doc_id").as("eval_id"), col("ngram"))
    require(evalRaw.limit(maxEvalNgrams + 1).count() <= maxEvalNgrams,
      s"contamination broadcasts the eval-side n-gram index — the eval " +
        s"split exceeds $maxEvalNgrams exploded n-grams; shrink the eval " +
        s"split or raise maxEvalNgrams (a bigger cap means a bigger " +
        s"broadcast build on every executor)")
    val evalSide = evalRaw.limit(maxEvalNgrams)
    exploded.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .join(broadcast(evalSide), Seq("ngram"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** Decontaminated training split: training documents with NO shared
    * n-gram against the eval split — [[contamination]]'s pair table turned
    * into a left-anti join. The output is the clean training corpus a
    * pretraining run would actually consume.
    */
  def decontaminate(documents: DataFrame, n: Int = 5,
                    evalMod: Long = 10L): DataFrame = {
    val hits = contamination(documents, n, evalMod)
      .select(col("doc_id")).distinct()
    documents.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .join(hits, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"))
  }

  /** Canonical text normalization — the cleanup stage that runs BEFORE any
    * content hash or shingle: collapse every whitespace run to one space,
    * trim, lowercase. Hash-based dedup is only as good as its
    * canonicalization (trailing-newline variants of the same page must
    * collide), so this is the first stage of the curation pipeline. A pure
    * narrow codegen'd projection — zero shuffle, runs at scan speed, which
    * is the only acceptable cost for a stage every document passes through.
    * The pattern is RE2-safe (no lookarounds) so any engine's oracle can
    * mirror it.
    */
  def normalizeText(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("norm_text",
      lower(trim(regexp_replace(col(textCol), "\\s+", " "))))

  // RE2-safe PII shapes (no lookarounds — oracle engines mirror them 1:1)
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction — replace emails, IPv4 addresses, and phone-shaped
    * numbers with typed placeholder tags, and count each kind (the counts
    * feed the curation audit: a source whose PII density jumps is quarantined
    * before its text ships). Counts are taken on the ORIGINAL text, then the
    * redactions apply in a fixed order (email → IP → phone) whose patterns
    * cannot create each other's matches, so the composition is
    * deterministic. Zero shuffle; all four outputs are codegen'd regex ops
    * over the row.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("redacted_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
  }

  /** Chunk-granularity exact dedup — the passage-level pass that catches
    * boilerplate shared across otherwise-distinct documents (headers,
    * licenses, navigation text), which document-level dedup misses by
    * construction and near-dup joins over-pay for when the repeat is
    * verbatim. Emits one row per distinct chunk content with its replica
    * count, distinct-document spread, and the keeper (lowest doc_id).
    *
    * Scale shape: the [[chunkDocuments]] stream (bounded per-doc generate,
    * zero shuffle) feeds ONE hash aggregation keyed by the chunk's sha256
    * digest — a uniform 32-byte key with map-side partial aggregation, the
    * same shape as [[Dedup.exactByContent]]. The chunk text itself never
    * shuffles: only the digest and two longs cross the wire.
    */
  def dedupChunks(documents: DataFrame, chunkTokens: Int,
                  overlapTokens: Int): DataFrame =
    chunkDocuments(documents, chunkTokens, overlapTokens)
      .groupBy(sha2(col("chunk_text"), 256).as("chunk_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))

  /** Corpus-level top-k tokens via the Misra-Gries
    * [[graft.functions.HeavyHitters]] typed Aggregator (exact while distinct
    * tokens ≤ sketch capacity; deterministic (count desc, token) order).
    */
  def heavyHitterTokens(spark: org.apache.spark.sql.SparkSession,
                        documents: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val toks = documents
      .select(explode(TextFns.tokens(col("text"))).as("tok")).as[String]
    toks.select(new graft.functions.HeavyHitters(k).toColumn).toDF("hh")
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.n").as("n"))
  }

  /** Per-domain token-budget sampling — the training-mix composition step
    * that CAPS each domain's contribution at a token budget (down-weighting
    * over-crawled domains) instead of thinning by a rate like
    * [[stratifiedSample]]. Docs are taken in content-addressed md5 order
    * (unbiased, reproducible across engines/partitionings/reruns — the same
    * determinism argument as [[deterministicSample]]) until the domain's
    * running token total reaches the budget; a doc is kept iff it STARTS
    * inside the budget, so every domain overshoots by at most one doc.
    *
    * Scale shape: one hash shuffle on the domain key and a running-sum
    * window inside each domain — domains are the natural unit of this
    * operation, and a single domain's docs fitting one task's sort is the
    * same assumption any per-domain pipeline stage makes. For web-scale
    * corpora with million-doc domains, pre-aggregating to (domain,
    * md5-bucket) subtotals would bound the window input; at that point the
    * cut is within one bucket, not one doc — the greedy semantics here are
    * the exact form.
    */
  def domainTokenBudget(documents: DataFrame, budgetTokens: Long,
                        domainCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    documents
      .select(col("doc_id"), col(domainCol).as("domain"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .filter(col("cum_before") < budgetTokens)
  }

  /** Temperature-weighted domain mixture sampling — the training-mix
    * REBALANCING step (the α-sampling of multilingual/pretraining recipes,
    * e.g. mBERT/XLM-R's p_d ∝ share_d^α): instead of capping each domain
    * ([[domainTokenBudget]]) or thinning by a GIVEN rate
    * ([[stratifiedSample]]), the per-domain quota is DERIVED from the
    * corpus composition — `quota_d = round(targetDocs · w_d / Σ w)` with
    * `w_d = sqrt(n_d)` (α = 1/2), flattening over-represented domains
    * while keeping rank order. Docs fill each quota in content-addressed
    * md5 order (the [[domainTokenBudget]] determinism argument).
    *
    * Cross-engine exactness: `sqrt` is IEEE-correctly-rounded (unlike
    * `pow`, whose last bits are libm-dependent — the reason α is pinned to
    * 1/2 here), each weight is rounded to integer micro-units, and the
    * quota is a half-up INTEGER ratio `(2·t·w + Σw) div (2·Σw)` — no
    * float ever crosses an aggregation boundary, so quotas hash-match the
    * oracle at any partitioning.
    *
    * Scale shape: the composition table is a tiny per-domain aggregate
    * joined back (AQE broadcasts it from measured size — no hint, its
    * subtree is a corpus-wide aggregate); selection is one md5-ordered
    * window per domain, the same per-domain-sort assumption as
    * [[domainTokenBudget]], with the same (domain, md5-bucket)
    * pre-aggregation remark for million-doc domains.
    */
  def domainMixtureSample(documents: DataFrame, targetDocs: Long,
                          domainCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val weights = documents
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs")) * lit(1000000.0), 0).cast("long"))
    val sumW = weights.agg(sum(col("w")).as("sum_w"))
    val quotas = weights.crossJoin(broadcast(sumW))
      .select(col("domain"),
        expr(s"(2 * ${targetDocs}L * w + sum_w) div (2 * sum_w)")
          .cast("long").as("quota"))
    documents
      .select(col("doc_id"), col(domainCol).as("domain"))
      .withColumn("rk", row_number().over(w))
      .join(quotas, "domain")
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("domain"), col("quota"))
  }

  /** Cross-corpus span-level dedup with document RECONSTRUCTION (the
    * C4-style "remove any span that occurs more than once in the corpus"
    * pass): split every document into disjoint `spanTokens`-token spans,
    * keep only each distinct span text's FIRST occurrence (global
    * (doc_id, span position) order), and reassemble what is left of each
    * document. Unlike [[dedupChunks]], which reports duplicate-chunk
    * groups, this emits the cleaned corpus itself — boilerplate (license
    * headers, navigation footers) survives exactly once, in its first
    * carrier. Documents whose every span is removed disappear entirely.
    *
    * Scale shape: two keyed shuffles — first-occurrence selection keyed by
    * the span text (content-keyed, uniform by construction; the QUALIFY-
    * style rank-1 filter is exactly the shape `RewriteRankOneToMaxBy`
    * rewrites into a map-side-combining min_by aggregate), then
    * reassembly keyed by doc_id with a bounded per-doc `collect_list`
    * (≤ ⌈doc tokens / spanTokens⌉ spans — same bound as chunking).
    */
  def dedupSpans(documents: DataFrame, textCol: String,
                 spanTokens: Int): DataFrame = {
    require(spanTokens > 0, "spanTokens must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("span_text")).orderBy(col("doc_id"), col("start_tok"))
    documents
      .select(col("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        ceil(size(col("toks")).cast("long") / lit(spanTokens.toDouble))
          .cast("long").as("n_spans"),
        col("toks"),
        explode(sequence(lit(0L), size(col("toks")).cast("long") - 1,
          lit(spanTokens.toLong))).as("start_tok"))
      .select(col("doc_id"), col("n_spans"), col("start_tok"),
        array_join(slice(col("toks"), (col("start_tok") + 1).cast("int"),
          lit(spanTokens)), " ").as("span_text"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("doc_id"))
      .agg(
        min(col("n_spans")).as("n_spans"),
        count(lit(1)).as("n_spans_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("start_tok"), col("span_text")))),
          s => s.getField("span_text")), " ").as("clean_text"))
  }

  /** LM-free quality scoring via corpus n-gram rarity — the perplexity
    * proxy: a document whose distinct bigrams are mostly corpus-rare
    * (document frequency ≤ `maxDf`) is likelier gibberish/noise than one
    * built from common constructions. Integer-exact throughout (FxMath
    * ratio), so the score is bit-stable across engines. Complements
    * [[textQuality]] (intra-doc ratios) and [[repetitionStats]] (intra-doc
    * repetition) with the corpus-level signal.
    *
    * Scale shape: the bigram document-frequency table is a hash aggregation
    * bounded by distinct bigrams; scoring is a shuffle equi-join of the
    * per-doc distinct-bigram stream against it on the bigram key (uniform
    * content key — no skew surface), then a per-doc re-aggregation. All
    * three exchanges are keyed; nothing driver-side, nothing all-pairs.
    */
  def rareNgramScore(documents: DataFrame, n: Int = 2,
                     maxDf: Long = 2L): DataFrame = {
    val sh = graft.functions.expr.VectorExpressions.shingles(col("text"), n)
    val exploded = documents.select(col("doc_id"), explode(sh).as("ngram"))
    val dfreq = exploded.groupBy(col("ngram"))
      .agg(count(lit(1)).as("df")) // shingles are distinct per doc: count = doc freq
    exploded.join(dfreq, Seq("ngram"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_distinct_ngrams"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_rare"),
        graft.functions.FxMath.ratio(
          sum(when(col("df") <= maxDf, 1L).otherwise(0L)),
          count(lit(1)), 4).as("rare_frac"))
  }

  /** Collocation mining: bigrams whose documents co-occur far more often
    * than their words' independent document frequencies predict — the
    * PMI-style "lift" signal used to surface multiword expressions worth
    * protecting from tokenizer splits. Lift is kept as an integer-exact
    * ratio (df_pair·n_docs / (df_w1·df_w2), FxMath-rounded) rather than a
    * log-PMI float, so the ranking is bit-stable across engines; log is
    * monotone, so the top-k is the same set either way.
    *
    * Scale shape: unigram and bigram document frequencies are hash
    * aggregates bounded by vocabulary size; the `minDf` filter cuts the
    * bigram side to frequent pairs BEFORE the two word-key joins (AQE
    * broadcasts the survivors); the final top-k plans as
    * TakeOrderedAndProject — per-partition heaps, k-row driver merge,
    * never a global sort or single-partition window.
    */
  def collocations(documents: DataFrame, minDf: Long = 5L,
                   k: Int = 20): DataFrame = {
    val toks = documents.select(
      explode(array_distinct(graft.functions.TextFns.tokens(col("text"))))
        .as("token"))
    val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("df_tok"))
    val pairs = documents
      .select(explode(graft.functions.expr.VectorExpressions
        .shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("df_pair"))
      .filter(col("df_pair") >= minDf)
      // tokens never contain spaces, so the bigram splits back losslessly;
      // the degenerate whole-doc shingle of 1-token docs has no second
      // word and drops out of the w2 join in both engines
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    pairs
      .join(uni.select(col("token").as("w1"), col("df_tok").as("df_w1")), "w1")
      .join(uni.select(col("token").as("w2"), col("df_tok").as("df_w2")), "w2")
      .crossJoin(broadcast(nDocs)) // 1-row global aggregate
      .select(col("bigram"), col("df_pair"),
        graft.functions.FxMath.ratio(
          col("df_pair") * col("n_docs"),
          col("df_w1") * col("df_w2"), 4).as("lift"))
      .orderBy(col("lift").desc, col("bigram")).limit(k)
  }

  /** Bigram-LM perplexity scoring — the CCNet/KenLM-style quality signal
    * (Wenzek et al., "CCNet", LREC 2020): train an add-one-smoothed
    * bigram language model on a reference slice, score every document by
    * its average negative log-likelihood, and rank — low-NLL documents
    * read like the reference corpus, high-NLL ones are the noise a
    * pretraining mix filters out. (The reference repo has no text
    * pipeline; this extends the engine's curation family.)
    *
    * Model: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) over `train`, where
    * c(w1) counts w1 as a bigram CONTEXT (so Σ_w2 numerator = denominator
    * and the conditional is proper) and V is the training vocabulary.
    * Unseen contexts/pairs degrade smoothly via the same formula with
    * zero counts — scoring is total over any `score` frame, including
    * docs the model never saw.
    *
    * Determinism: the one transcendental (ln) is rounded to integer
    * MICRO-NATS per bigram occurrence before any aggregation — the
    * `retrieval_bm25` precedent — so the per-document sums and the
    * final rounded-division average are exact BIGINT arithmetic that
    * DuckDB replays bit-for-bit.
    *
    * Scale shape: both model tables are hash aggregates bounded by
    * (observed-bigram, vocabulary) cardinality, never corpus size; the
    * scoring side is two equi-joins keyed on near-uniform token strings
    * (AQE broadcasts the model when it fits, degrades to shuffle joins
    * when it doesn't — no forced hints) plus one broadcast 1-row
    * vocabulary aggregate; the per-document rollup is a map-side-combining
    * hash aggregate. Nothing is windowed, nothing collects.
    */
  def lmPerplexity(trainIn: DataFrame, scoreIn: DataFrame): DataFrame = {
    // the bigram explosion is the CPU term of both passes — fan the scans
    // out so it never runs single-task on a one-file input (Par.fanOutScan)
    val train = Par.fanOutScan(trainIn)
    val score = Par.fanOutScan(scoreIn)
    def bigramsOf(df: DataFrame, cols: Column*): DataFrame = {
      val w = graft.functions.TextFns.tokens(col("text"))
      // positional bigram MULTISET (every occurrence, unlike the
      // distinct shingle set near-dup uses); <2-token docs have none
      val arr = when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => concat_ws(" ",
            element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast("array<string>"))
      df.select(cols :+ explode(arr).as("bigram"): _*)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
    }
    // the pair table is the model — vocab-bounded, consumed TWICE (pair
    // counts + the context-count re-aggregation). Materialize it once
    // (eager localCheckpoint) so the corpus-sized bigram multiset is
    // aggregated in ONE pass, not re-run per consumer (guide §1.2: don't
    // compute things twice; at 100 TB this halves the model build).
    val pairCountsFull = bigramsOf(train)
      .groupBy("bigram", "w1").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val pairCounts = pairCountsFull.select("bigram", "c12")
    // c(w1) = Σ_w2 c(w1,w2) exactly, so the context counts re-aggregate
    // the vocab-bounded pair table — NOT the corpus-sized bigram
    // multiset a second time (one corpus-wide shuffle saved; at 100 TB
    // the model build is one pass + one tiny rollup)
    val ctxCounts = pairCountsFull.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = train
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bigramsOf(score, col("doc_id"))
      .join(pairCounts, Seq("bigram"), "left")
      .join(ctxCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab)) // 1-row global aggregate
      .withColumn("cost_micro",
        round(log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
          * lit(-1000000.0), 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("cost_micro")).as("nll_micro"))
      .withColumn("avg_nll_micro",
        graft.functions.FxMath.roundedDiv(col("nll_micro"), col("n_bigrams")))
  }
}
