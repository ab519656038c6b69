package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record matching — the standard entity-resolution shape
  * (blocking + pairwise compare, Fellegi–Sunter lineage): candidate pairs
  * are generated ONLY within blocks that share cheap exact attributes,
  * then refined with an edit-distance compare. The curation use is source
  * catalog reconciliation (merging near-identical records that differ by
  * typos) — a different similarity regime from the token-set joins
  * ([[DedupApprox]]: long texts, set overlap) and from dense embeddings
  * ([[Ann]]): short strings, character-level edits.
  *
  * Exactness: `levenshtein` is unit-cost edit distance in both Spark
  * (`functions.levenshtein`, Catalyst codegen) and DuckDB — an exact
  * integer, so the oracle replays the operator verbatim.
  *
  * Scale shape: the block key is an EQUI-join key, so candidate
  * generation hash-partitions on it and each block's quadratic pair set
  * is local to a partition — total cost Σ_b |b|², the whole point of
  * blocking (all-pairs at 10^9 records is off the table; thousands of
  * ~tens-sized blocks are trivial). Block-size skew is the operator's one
  * hazard: a degenerate hot block is quadratic, so production keys
  * compose enough attributes to bound block cardinality, and AQE's
  * skew-join split absorbs stragglers. The refine runs INSIDE the joined
  * row (no second shuffle) and the distance predicate prunes before any
  * further stage sees the pairs.
  */
object EntityResolution {

  /** Pairs of `rows` (by `idCol`, emitted id_a < id_b) that share every
    * `blockCols` value exactly and whose `textCol` values are within
    * `maxDist` edits. Output carries the matched texts + the distance as
    * exact evidence columns.
    */
  def blockedFuzzyJoin(rows: DataFrame, blockCols: Seq[String],
                       idCol: String, textCol: String,
                       maxDist: Int): DataFrame = {
    val cond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    rows.as("a").join(rows.as("b"), cond)
      .withColumn("dist", levenshtein(col(s"a.$textCol"), col(s"b.$textCol")))
      .filter(col("dist") <= maxDist)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col(s"a.$textCol").as("text_a"), col(s"b.$textCol").as("text_b"),
        col("dist"))
  }

  /** UNBLOCKED edit-distance self-join via q-gram prefix filtering — the
    * ED-Join idea (Xiao, Wang & Lin, VLDB 2008 lineage) when no cheap
    * exact blocking attribute exists: all pairs within `maxDist` edits,
    * WITHOUT generating the quadratic pair space.
    *
    * Filter chain (each step only ever KEEPS a true match — completeness
    * is the invariant, `levenshtein` at the end restores exactness):
    *
    *  1. '''q-gram tokens, bag-exact''': each string yields its q-grams
    *     tagged with an occurrence index, so duplicate grams ("00" five
    *     times in "000000") join like bag elements — set semantics on
    *     (gram, occ) IS bag semantics on grams.
    *  2. '''Prefix filter''': k edits destroy at most k·q grams, so two
    *     strings within k share all but k·q of the larger bag; under a
    *     global rarest-first gram order, any such pair must share one of
    *     each side's min(|G|, k·q+1) RAREST tokens. Only those prefix
    *     tokens enter the inverted-index self-join — the hot universal
    *     grams (shared prefixes, common digrams) never generate pairs,
    *     which is what keeps Σ freq² bounded at scale.
    *  3. '''Short-string fallback''': strings with ≤ k·q grams can match
    *     with ZERO shared grams (|G| − k·q ≤ 0 is vacuous), so the short
    *     group — length < (k+1)·q, a constant-size class — pairs among
    *     itself directly. Short×long pairs are covered by the main join
    *     (the long side's bound stays ≥ 1 under the length filter).
    *  4. '''Length filter''' |len(a) − len(b)| ≤ k, then the exact
    *     `levenshtein ≤ k` verify inside the joined row.
    *
    * Scale shape: candidate generation is an equi-join on (gram, occ)
    * restricted to prefix tokens; cost follows the RARE-gram frequency
    * spectrum, not the hot one. The verify is O(candidates · |s|²) on
    * short strings (names, codes, phones — this operator's regime; long
    * documents belong to the token-set joins in [[DedupApprox]]).
    */
  def editDistanceJoin(rows: DataFrame, idCol: String, textCol: String,
                       maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 1, "maxDist and q must be positive")
    val kq = maxDist * q
    val docs = rows.select(col(idCol).as("id"), col(textCol).as("text"))
      .filter(col("text").isNotNull)
      .withColumn("len", length(col("text")))

    // grams with occurrence index (bag-exact token identity)
    val grams = docs
      .withColumn("g", greatest(col("len") - q + 1, lit(0)))
      .select(col("id"), col("g"), posexplode_outer(
        // guarded: sequence(1, 0) would run DESCENDING in Spark and mint
        // bogus grams for sub-q strings — those strings have no grams
        expr(s"CASE WHEN len >= $q THEN transform(sequence(1, len - ${q - 1}), i -> substring(text, i, $q)) ELSE array() END")))
      .filter(col("col").isNotNull)
      .withColumn("occ", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"), col("col")).orderBy(col("pos"))))
      .select(col("id"), col("g"), col("col").as("gram"), col("occ"))

    // global rarest-first order; ties broken lexically so the order is total
    val freq = grams.groupBy("gram", "occ").agg(count(lit(1)).as("f"))
    val prefix = grams.join(freq, Seq("gram", "occ"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("f"), col("gram"), col("occ"))))
      .filter(col("rk") <= kq + 1)
      .select(col("id"), col("gram"), col("occ"))

    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // the vacuous-bound class pairs among itself (constant-size strings)
    val shorts = docs.filter(greatest(col("len") - q + 1, lit(0)) <= kq)
      .select(col("id"), col("len"))
    val shortPairs = shorts.as("a")
      .join(shorts.as("b"), col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

    val a = docs.select(col("id").as("id_a"), col("text").as("text_a"),
      col("len").as("len_a"))
    val b = docs.select(col("id").as("id_b"), col("text").as("text_b"),
      col("len").as("len_b"))
    // pin the verify's parallelism: the deduped candidate set is tiny in
    // BYTES (ids only), so AQE coalesces it to one partition — and then the
    // O(|s|²)-per-pair levenshtein verify runs single-task (measured 2.2 s
    // of the operator's 3.0 s at sf0.1). An explicit fixed-width
    // repartition is exempt from AQE coalescing, spreading the CPU-bound
    // verify across the cluster; at scale the candidate set is large and
    // the exchange it replaces would have existed anyway (the join below
    // shuffles ids regardless).
    candidates.union(shortPairs).distinct()
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
      .join(a, "id_a").join(b, "id_b")
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"),
        col("dist"))
  }
}
