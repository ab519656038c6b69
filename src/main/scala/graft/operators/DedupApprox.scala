package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Near-duplicate detection for training-data pipelines (BASELINE.json
  * north_star): exact similarity join, MinHash+LSH, and SimHash — each built
  * scale-first: candidate generation is always a key-equality join (shuffle
  * on a derived bucket key), never an all-pairs product.
  */
object DedupApprox {

  /** Exact Jaccard similarity join over word-shingle sets with prefix
    * filtering (Bayardo et al. All-Pairs / PPJoin): under a global
    * (frequency, shingle) order, any pair with J ≥ t must share one of each
    * doc's first |S| − ⌈t·|S|⌉ + 1 shingles — so only those prefix shingles
    * are indexed. Candidates then join back to the full sets for the exact
    * intersection. Exact (no false negatives) at any threshold.
    *
    * Scale shape: the candidate join shuffles on rare shingles only, which
    * bounds posting-list fan-out — the naive full inverted index melts down
    * on hot shingles (every doc pair sharing a stopword-ish shingle becomes
    * a candidate), which is precisely what happened at sf0.1 (9 s → ~2 s).
    */
  /** The word-shingle inverted index `(doc_id, n, shingle)` with per-doc
    * set size `n` — the shared substrate of candidate generation and exact
    * refinement.
    */
  private[operators] def shingleIndex(documents: DataFrame): DataFrame =
    Par.fanOutScan(documents)
      .select(col("doc_id"), TextFns.shingleSet(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
      .select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))

  /** Exact-Jaccard refinement of a `(doc_a, doc_b)` candidate set from the
    * inverted index: |A ∩ B| = the number of (doc_b, shingle) rows both
    * sides share — a count over two equi-joins on scalar keys. Joining the
    * full shingle ARRAYS back to every candidate and running
    * array_intersect per pair loses to counting matched postings, and at
    * 100 TB the arrays are exactly what you don't want on the wire.
    * (A candidate pair sharing zero shingles drops out of the inner join —
    * correct at any threshold > 0, since its Jaccard is 0.)
    */
  private[operators] def exactJaccardRefine(candidates: DataFrame, inv: DataFrame,
                                            threshold: Double): DataFrame =
    candidates
      .join(inv.select(col("doc_id").as("doc_a"), col("n").as("na"), col("shingle")), Seq("doc_a"))
      .join(inv.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", graft.functions.FxMath.ratio(
        col("shared"), col("na").cast("long") + col("nb") - col("shared"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  def jaccardJoin(documents: DataFrame, threshold: Double): DataFrame =
    jaccardJoinImpl(shingleIndex(documents), threshold)

  /** As [[jaccardJoin]], but materializes the shingle inverted index once
    * (MEMORY_AND_DISK) instead of recomputing its lineage for each of the
    * five consumers in the pair plan (df aggregate, both prefix self-join
    * sides, both refine sides) — Catalyst can't exchange-reuse them because
    * each consumer shuffles the index on a different key. The caller owns
    * the cache: invoke the returned release AFTER materializing the pairs
    * (or anything derived from them).
    *
    * MEASURED SLOWER at sf0.1 (min-of-5: 2.13 s vs 1.22 s plain,
    * `CcProfile`, BASELINE.md round-9 note): the cache-materialization
    * barrier plus writing every exploded posting costs more than five
    * re-shinglings of short documents. Kept because the tradeoff is
    * corpus-shaped, not universal — shingling cost grows with document
    * LENGTH while posting volume grows with distinct-shingle count, so a
    * long-document corpus (or an expensive tokenizer) flips it. Measure on
    * the target corpus before choosing; [[jaccardJoin]] (recompute, the
    * Spark-idiomatic lineage default) is the shipped path.
    */
  private[graft] def jaccardJoinStaged(documents: DataFrame,
                                       threshold: Double): (DataFrame, () => Unit) = {
    val inv = shingleIndex(documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (jaccardJoinImpl(inv, threshold), () => { inv.unpersist(blocking = false); () })
  }

  /** Per-doc PPJoin prefix postings `(doc_id, n, pos, shingle)` under the
    * global (df, shingle) total order given by `freq`: position = rank of
    * the shingle in the doc's full sorted set, kept iff within the first
    * |S| − ⌈t·|S|⌉ + 1. Shingles absent from `freq` order as df = 0 —
    * FIRST (rarest) — which is what makes a FROZEN corpus-frequency table
    * usable for incremental probes ([[DedupIndex]]): correctness of prefix
    * filtering needs only that every doc's prefix is computed under the
    * SAME total order, and (0-filled df, shingle) is total and frozen.
    */
  private[operators] def prefixPostings(inv: DataFrame, freq: DataFrame,
                                        threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefixLen = col("n") - ceil(col("n") * threshold).cast("int") + 1
    inv.join(freq, Seq("shingle"), "left")
      .na.fill(0L, Seq("df"))
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= prefixLen)
      .select(col("doc_id"), col("n"), col("pos"), col("shingle"))
  }

  private def jaccardJoinImpl(inv: DataFrame, threshold: Double): DataFrame = {
    // global canonical order: shingle document-frequency, then the shingle
    val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val prefix = prefixPostings(inv, freq, threshold)
    // PPJoin candidate pruning (Xiao et al., WWW'08) — two upper-bound
    // filters that can never drop a true pair, applied INSIDE the
    // shingle-key join before the dedup shuffle:
    //  - length filter: J ≥ t forces t·|B| ≤ |A| (size ratio within t);
    //  - positional filter: matching at prefix positions (pa, pb) caps the
    //    overlap at 1 + min(|A|−pa, |B|−pb), which must reach the
    //    equivalent overlap bound α = ⌈t/(1+t)·(|A|+|B|)⌉.
    // At sf0.1 these cut the candidate set ~6× (210k joined prefix rows →
    // 110k after length → 36k after positional → 33k distinct pairs), which
    // is the whole cost of the exact refine at 100 TB — the filters are
    // arithmetic on (n, pos) already on the joined row, so they're free
    // relative to the shuffles they shrink.
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("a.n") + col("b.n"))).cast("int")
    val candidates = prefix.as("a").join(prefix.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.n") >= ceil(col("b.n") * threshold).cast("int") &&
        col("b.n") >= ceil(col("a.n") * threshold).cast("int"))
      .filter(lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    exactJaccardRefine(candidates, inv, threshold)
  }

  /** Asymmetric-sides PPJoin candidate generation: prefix postings `a`
    * joined against prefix postings `b` on the shared shingle, the same
    * length + positional upper-bound filters as [[jaccardJoinImpl]], pairs
    * canonicalized (doc_a < doc_b) and deduped. Unlike the self-join form
    * this cannot order-prune before the join (a pair may surface with
    * either side holding the smaller id), so least/greatest + distinct
    * canonicalizes — the [[DedupIndex]] probe shape, where `a` is the
    * delta and `b` is corpus-prefix ∪ delta-prefix. EXACT: no true pair
    * at ≥ `threshold` is dropped, provided both sides' prefixes were
    * computed under the same total order at a base threshold ≤ `threshold`.
    */
  private[operators] def prefixCandidates(a: DataFrame, b: DataFrame,
                                          threshold: Double): DataFrame = {
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("a.n") + col("b.n"))).cast("int")
    a.as("a").join(b.as("b"), "shingle")
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .filter(col("a.n") >= ceil(col("b.n") * threshold).cast("int") &&
        col("b.n") >= ceil(col("a.n") * threshold).cast("int"))
      .filter(lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Number of MinHash permutations and LSH banding (16 = 4 bands × 4 rows:
    * catches Jaccard ≳ 0.7 with high probability).
    */
  val NumHashes = 16
  val Bands = 4
  val Rows: Int = NumHashes / Bands

  /** MinHash signature — native [[graft.functions.expr.MinHashSig]] expression
    * (one xxhash64 per shingle + cheap universal-hash permutations; the
    * equivalent HOF composition was interpreted and dominated the bench).
    */
  def minhashSignature(shingleSet: Column): Column =
    graft.functions.expr.VectorExpressions.minhashSig(shingleSet, NumHashes)

  /** MinHash + LSH candidate pairs: docs agreeing on all rows of ≥1 band —
    * candidate generation is a groupBy/join on (band, band-hash), i.e. a
    * plain shuffle key, never an all-pairs comparison.
    */
  /** Per-document LSH band keys `(doc_id, band, bh)` — the constant
    * `Bands` rows per doc that candidate generation (and the persisted
    * [[DedupIndex]]) shuffle/store instead of content.
    */
  private[graft] def bandKeys(documents: DataFrame): DataFrame = {
    val sigs = Par.fanOutScan(documents).select(
      col("doc_id"),
      minhashSignature(TextFns.shingleSet(col("text"))).as("sig"))
    val bandStructs = (0 until Bands).map(b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * Rows + 1, Rows)).as("bh")))
    sigs.select(
      col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  private def minhashCandidates(documents: DataFrame): DataFrame = {
    val banded = bandKeys(documents)
    banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash + LSH near-dup pairs, exact-verified: banded signature
    * candidates refined with the true Jaccard from the shingle inverted
    * index, filtered at `threshold` — the production dedup shape (sketchy
    * candidate generation, exact verification) and the reason this
    * operator's OUTPUT is deterministic and oracle-able even though the
    * signatures themselves are not SQL-expressible. vs [[jaccardJoin]]:
    * same refine, different candidate generator — LSH bands shuffle a
    * constant 4 rows per doc regardless of document length, where the
    * PPJoin prefix index shuffles O(prefix) postings; the tradeoff is
    * probabilistic recall (capped by the band catch rate at `threshold`)
    * vs PPJoin's exactness.
    */
  def minhashPairs(documents: DataFrame, threshold: Double): DataFrame =
    exactJaccardRefine(minhashCandidates(documents),
      shingleIndex(documents), threshold)

  /** documents + a 64-bit `sh` SimHash column over whitespace tokens —
    * native [[graft.functions.expr.SimHash64]] expression (the HOF/SQL-lambda
    * formulation of the same fold was interpreted per element and ~1000×
    * slower at sf0.1).
    */
  def withSimhash(documents: DataFrame): DataFrame =
    Par.fanOutScan(documents).select(col("doc_id"),
      graft.functions.expr.VectorExpressions.simhash64(TextFns.tokens(col("text"))).as("sh"))

  /** SimHash near-dup pairs: 4×16-bit band join for candidates, then exact
    * Hamming distance via bit_count(a XOR b) ≤ maxHamming. Same
    * shuffle-on-bucket-key shape as MinHash LSH.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int): DataFrame = {
    val hashed = withSimhash(documents)
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("bv")))
    val banded = hashed.select(
      col("doc_id"), col("sh"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
