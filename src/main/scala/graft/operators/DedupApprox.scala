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

  /** Exact Jaccard similarity join over word-shingle sets via an inverted
    * index: explode shingles → self-join on the shingle → count shared per
    * pair → Jaccard from set sizes. Exact (no false negatives for any
    * threshold) and distributed: the shuffle key is the shingle, pair counts
    * are partial-aggregated.
    *
    * Scale path: at 100 TB, add prefix filtering (only index each doc's
    * rarest ⌈(1−t)·|S|⌉+1 shingles) to bound candidate fan-out; the join
    * shape stays identical.
    */
  def jaccardJoin(documents: DataFrame, threshold: Double): DataFrame = {
    val sets = documents
      .select(col("doc_id"), TextFns.shingleSet(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    val inv = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
    inv.as("a").join(inv.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Number of MinHash permutations and LSH banding (16 = 4 bands × 4 rows:
    * catches Jaccard ≳ 0.7 with high probability).
    */
  val NumHashes = 16
  val Bands = 4
  val Rows: Int = NumHashes / Bands

  /** MinHash signature: for seed s, min over shingles of xxhash64(s, shingle).
    * One array column, computed in a single codegen'd projection.
    */
  def minhashSignature(shingleSet: Column): Column =
    transform(sequence(lit(1), lit(NumHashes)),
      s => array_min(transform(shingleSet, x => xxhash64(s, x))))

  /** MinHash + LSH near-dup candidates with estimated Jaccard.
    * Banding: docs agreeing on all rows of ≥1 band become candidates —
    * candidate generation is a groupBy/join on (band, band-hash), i.e. a
    * plain shuffle key, never an all-pairs comparison. Estimated Jaccard =
    * fraction of agreeing signature positions; final filter at `threshold`.
    */
  def minhashPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val sigs = documents.select(
      col("doc_id"),
      minhashSignature(TextFns.shingleSet(col("text"))).as("sig"))
    val bandStructs = (0 until Bands).map(b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * Rows + 1, Rows)).as("bh")))
    val banded = sigs.select(
      col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), e => e))
          .cast("double") / NumHashes).as("est_jaccard"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash from token hashes: signed bit-count accumulation via a
    * sequential array fold, packed with bitwise OR (no ANSI overflow).
    * Variable-distance shifts aren't expressible through the Scala
    * `shiftright(Column, Int)` overload, so the two folds are SQL lambda
    * expressions (still fully Catalyst-compiled HigherOrderFunctions).
    */
  private def bitCountsSql(toksCol: String): String =
    s"""aggregate($toksCol, array_repeat(cast(0 as bigint), 64),
       |  (a, t) -> zip_with(a,
       |    transform(sequence(0, 63),
       |      j -> if((shiftright(xxhash64(t), j) & 1) = 1,
       |              cast(1 as bigint), cast(-1 as bigint))),
       |    (x, y) -> x + y))""".stripMargin

  private def packBitsSql(accCol: String): String =
    s"""aggregate(
       |  transform(sequence(0, 63),
       |    i -> if(element_at($accCol, i + 1) > 0,
       |            shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
       |  cast(0 as bigint), (a, v) -> a | v)""".stripMargin

  /** documents + a 64-bit `sh` SimHash column over whitespace tokens. */
  def withSimhash(documents: DataFrame): DataFrame =
    documents
      .withColumn("__toks", TextFns.tokens(col("text")))
      .withColumn("__acc", expr(bitCountsSql("__toks")))
      .select(col("doc_id"), expr(packBitsSql("__acc")).as("sh"))

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
