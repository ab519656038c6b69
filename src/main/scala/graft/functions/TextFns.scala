package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-training-data operators
  * (BASELINE.json north_star; SURVEY.md §7.5 extensions).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so the expressions stay inside
  * whole-stage codegen and scale with the scan. Tokenization is
  * whitespace-split (the fixture documents are single-space word salads);
  * a BPE-ish regex variant is provided for mixed text.
  */
object TextFns {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish tokenization: word pieces OR single non-space symbols —
    * the usual pre-tokenizer shape (letters+digits runs, else one char).
    * RE2-safe pattern (no lookarounds) so oracles can mirror it.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Word n-gram shingles (default n=3) — the unit for near-dup detection.
    * Short docs (< n tokens) collapse to one whole-doc shingle.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** Distinct shingles — the set near-dup similarity is defined over.
    * Native single-pass expression (see [[graft.functions.expr.Shingles]]);
    * the HOF composition above is the reference semantics.
    */
  def shingleSet(text: Column, n: Int = 3): Column =
    graft.functions.expr.VectorExpressions.shingles(text, n)

  /** Order-sensitive rolling hash over a text's codepoints:
    * `h := (h·131 + cp) mod (2³¹−1)` (Rabin-Karp polynomial fingerprint).
    * Delegates to the native [[graft.functions.expr.PolyRollingHash]]; the
    * equivalent HOF fold is
    * `aggregate(transform(filter(split(text, ''), c -> c != ''),
    *   c -> ascii(c)), 0L, (h, c) -> (h*131 + c) % 2147483647)`.
    * Re-based from an xxhash64 chain so any engine with 64-bit integer
    * arithmetic computes the identical fingerprint (cross-engine oracle-able;
    * an engine-private hash chain is not).
    */
  def rollingHash(text: Column): Column =
    graft.functions.expr.VectorExpressions.polyRollingHash(text)

  /** Bag-of-words fingerprint: sha256 over the sorted distinct token set —
    * order-independent content signature (SURVEY.md §7.5).
    */
  def bowFingerprint(text: Column): Column =
    sha2(array_join(array_sort(array_distinct(tokens(text))), " "), 256)

  /** Stopword hits in a token array. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Real profiles would be learned; these are the classic
    * high-frequency function words per language.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Language-ID heuristic: argmax of stopword-profile hit counts, 'und'
    * (undetermined) when nothing matches. Deterministic tie-break via struct
    * ordering (score, then language code).
    */
  def langId(toks: Column): Column = {
    val entries = LangProfiles.map { case (lang, words) =>
      struct(stopwordCount(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
