package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EntityResolution, SparseSim}

/** Sparse TF-cosine join and blocked fuzzy ER: hand-checkable cosine
  * geometry through the integer cross-norm predicate, df-pruning
  * semantics, and blocking/refine behavior on planted typos.
  */
class SparseSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Disjoint-token filler docs: the df ≤ n/2 pruning is relative to
    * corpus size, so tiny fixtures need padding or every shared token
    * (df = 2 of n = 2) would be pruned from the space.
    */
  private def fillers(k: Int): Seq[(Long, String)] =
    (1 to k).map(i => (100L + i, s"filler_${i}_a filler_${i}_b"))

  private def pairs(docs: Seq[(Long, String)], tMilli: Long): Set[(Long, Long)] =
    SparseSim.cosineTfJoin((docs ++ fillers(3)).toDF("doc_id", "text"), tMilli)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("identical docs are cos=1; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"))
    assert(pairs(docs, 999L) == Set((1L, 2L)))
  }

  test("the integer predicate places a hand-computed cosine on the right side of the threshold") {
    // a = {x:1, y:1}, b = {x:1, z:1}: cos = 1/2 exactly — in at t=0.5,
    // out at t=0.501 (the ≥ comparison is exact, no float rounding)
    val docs = Seq((1L, "x y"), (2L, "x z"))
    assert(pairs(docs, 500L) == Set((1L, 2L)))
    assert(pairs(docs, 501L) == Set.empty[(Long, Long)])
  }

  test("repeated tokens weight the dot product (tf, not set semantics)") {
    // a = {x:3, y:1}, b = {x:3, z:1}: dot=9, |a|²=|b|²=10 → cos=0.9 — a
    // set-based (Jaccard-ish) measure would see 1 shared of 3 tokens
    val docs = Seq((1L, "x x x y"), (2L, "x x x z"))
    assert(pairs(docs, 899L) == Set((1L, 2L)))
    assert(pairs(docs, 901L) == Set.empty[(Long, Long)])
  }

  test("tokens in more than half the corpus are excluded from the space") {
    // "the" appears in 3/4 docs (df=3 > 4/2): without pruning docs 1,2
    // share it (cos>0); with pruning their kept vectors are disjoint.
    // Docs 3,4 stay identical on their kept token "rare".
    val docs = Seq(
      (1L, "the foo"), (2L, "the bar"),
      (3L, "the rare"), (4L, "rare"))
    // unpadded on purpose: n=4, df("the")=3 > 2 prunes it; df("rare")=2 stays
    val got = SparseSim.cosineTfJoin(docs.toDF("doc_id", "text"), 100L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 4L)))
  }

  test("exact evidence columns: dot and squared norms are the hand-computed integers") {
    val docs = Seq((1L, "x x y"), (2L, "x y y"))
    val row = SparseSim.cosineTfJoin((docs ++ fillers(3)).toDF("doc_id", "text"), 500L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // dot = 2*1 + 1*2 = 4; both norms 2²+1² = 5; cos = 4/5
    assert(row == Set((1L, 2L, 4L, 5L, 5L)))
  }

  test("blocked ER matches typos within a block and never crosses blocks") {
    val parts = Seq(
      (1L, "B1", 5, "red widget"),
      (2L, "B1", 5, "red widgee"),   // 1 edit from #1
      (3L, "B1", 5, "blue gearbox"), // far from both
      (4L, "B2", 5, "red widget"),   // identical text, other block
      (5L, "B1", 7, "red widget")    // identical text, other size
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    val got = EntityResolution.blockedFuzzyJoin(
        parts, Seq("p_brand", "p_size"), "p_partkey", "p_name", 3)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1)))
  }

  test("distance zero pairs (exact duplicate records) are reported") {
    val parts = Seq(
      (1L, "B1", 5, "red widget"),
      (2L, "B1", 5, "red widget")
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    val got = EntityResolution.blockedFuzzyJoin(
        parts, Seq("p_brand", "p_size"), "p_partkey", "p_name", 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0)))
  }
}
