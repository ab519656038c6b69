package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Exact sparse-vector cosine similarity self-join over term-frequency
  * vectors, via an inverted index — the lexical companion to the dense
  * embedding joins in [[Ann]]: TF-weighted cosine is the classic
  * bag-of-words duplicate/mirror detector (Broder-era near-dup stacks ran
  * exactly this before minhash), and the "sparse retrieval" half of hybrid
  * dedup recipes.
  *
  * Exactness device: everything stays in INTEGER arithmetic. A pair
  * qualifies iff cos(a,b) ≥ t, and with non-negative tf vectors that is
  *
  *   dot(a,b)^2 · 10^6  ≥  t_milli^2 · ‖a‖² · ‖b‖²
  *
  * — both sides exact BIGINTs (no sqrt, no float division), so the DuckDB
  * oracle replays the operator bit-for-bit. Outputs carry (dot, ‖a‖²,
  * ‖b‖²) rather than a rounded cosine: exact ints, no cross-engine float
  * hazard. Overflow audit: dot ≤ 10^5 even for 10^3-token documents, so
  * 10^6·dot² ≤ 10^16 ≪ 2^63.
  *
  * Vector space: tokens appearing in MORE than half the corpus are
  * excluded from the space entirely (weights AND norms) — the df-pruning
  * every sparse retrieval stack applies (a token in most documents carries
  * no signal but couples every document pair). The threshold is part of
  * the operator's semantics, mirrored by the oracle.
  *
  * Scale shape: one explode + two hash aggregates build the postings
  * (token-partitioned); pair generation is an equi-join of the postings
  * with themselves ON TOKEN, so only pairs sharing a surviving token are
  * ever scored — cost is Σ_t df(t)² over kept tokens, not n². That is the
  * inverted-index join production sparse-sim uses; for corpora where even
  * shared-token fan-out is too hot, the LSH path
  * ([[DedupApprox.minhashPairs]]) is the approximate scale default and
  * this operator is its exactness oracle, the same split as
  * jaccardJoin/minhash. The df cap also bounds the worst posting list at
  * n/2; AQE's skew-join split handles the residual hot-token straggler.
  */
object SparseSim {

  /** Pairs (doc_a < doc_b) with TF-cosine ≥ `thresholdMilli`/1000 over the
    * df-pruned token space. Returns exact integer evidence columns
    * (`dot`, `norm2_a`, `norm2_b`).
    */
  def cosineTfJoin(documents: DataFrame, thresholdMilli: Long): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val kept = tf
      .join(tf.groupBy("token").agg(count(lit(1)).as("df")), "token")
      .crossJoin(broadcast(nDocs)) // 1-row corpus size
      .filter(col("df") * 2 <= col("n_docs"))
      .select("doc_id", "token", "tf")
    val norms = kept.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("norm2"))
    // postings self-join: score only shared-token pairs, count matched
    // postings — full token arrays never travel (same device as the
    // PPJoin refine in DedupApprox)
    val dots = kept.as("a")
      .join(kept.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("norm2").as("norm2_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("norm2").as("norm2_b")), "doc_b")
      .filter(lit(1000000L) * col("dot") * col("dot") >=
        lit(thresholdMilli * thresholdMilli) * col("norm2_a") * col("norm2_b"))
      .select("doc_a", "doc_b", "dot", "norm2_a", "norm2_b")
  }
}
