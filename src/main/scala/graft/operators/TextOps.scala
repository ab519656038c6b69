package graft.operators

import org.apache.spark.sql.DataFrame
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
      round(length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(toks), 4)
        .as("avg_token_len"),
      size(TextFns.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
  }

  /** Quality scoring: stopword ratio and type-token ratio composed into a
    * single score — the classic cheap quality filters for pretraining data.
    * Ratios are exact integer divisions → bit-stable across engines.
    */
  def textQuality(documents: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks)
    val stopRatio = TextFns.stopwordCount(toks, Seq("the", "a")).cast("double") / nTok
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    documents.select(
      col("doc_id"),
      round(stopRatio, 4).as("stop_ratio"),
      round(ttr, 4).as("ttr"),
      round(ttr * (lit(1.0) - stopRatio), 4).as("quality_score"))
  }

  /** Language-ID heuristic + agreement with the labeled `lang` column. */
  def langId(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      TextFns.langId(TextFns.tokens(col("text"))).as("predicted_lang"))

  /** Content fingerprints: order-independent bag-of-words sha256 and the
    * order-sensitive rolling hash.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      TextFns.bowFingerprint(col("text")).as("bow_fingerprint"),
      TextFns.rollingHash(TextFns.tokens(col("text"))).as("rolling_hash"))

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
}
