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
}
