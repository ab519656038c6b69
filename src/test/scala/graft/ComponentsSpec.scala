package graft

import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected-components semantics: transitive closure over undirected
  * pairs, deterministic min-id labels, convergence beyond round 0 (chain
  * graphs), and the cluster-level retention view over near-dup pairs.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two components and a chain resolve to min-id labels") {
    // component {1,2,3,4,5} is a CHAIN 5-4-3-2-1 (diameter 4: label 1 must
    // propagate through 4 hops — exercises the iteration, not just round 0)
    // component {10,11} is a single edge; 7 appears only via edge (7,12)
    val edges = Seq(
      (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (12L, 7L)
    ).toDF("src", "dst")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 7L -> 7L, 12L -> 7L))
  }

  test("empty edge sets yield empty results, not a crash") {
    // sum() over an empty frame is null — a pair-free corpus (nothing over
    // the similarity threshold) must flow through as an empty result
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Components.connectedComponents(none).count() == 0L)
    assert(Components.starContractionComponents(none).count() == 0L)
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "five six seven eight")
    ).toDF("doc_id", "text")
    assert(Components.dedupClusters(docs, 0.99).count() == 0L)
  }

  test("a chain deeper than the iteration cap falls back to star contraction, not split labels") {
    // path 0-1-2-…-40: diameter 40 > MaxIterations (30), so min-label
    // propagation CANNOT converge inside the cap — pre-fallback behavior
    // silently returned split clusters here; now connectedComponents must
    // detect the cap exit and hand the graph to star contraction, which
    // converges in O(log) rounds on exactly this shape
    assert(Components.MaxIterations < 40, "fixture must exceed the cap")
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L to 40L).toSet)
    assert(got.values.toSet == Set(0L),
      s"all 41 chain nodes must collapse to component 0, got ${got.values.toSet}")
  }

  test("random graphs match a reference union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40
      val edgeSeq = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: driver-side union-find with min-id roots
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edgeSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct
      // canonicalize: min node id per root
      val byRoot = nodes.groupBy(v => find(v.toInt))
      val expected = byRoot.values.flatMap { vs =>
        val m = vs.min; vs.map(_ -> m)
      }.toMap
      val got = Components.connectedComponents(edgeSeq.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("1M-node block-chain graph: correct labels at scale, diameter-bounded rounds") {
    // 125k disjoint chains of 8 nodes each (node i links to i+1 unless i
    // closes a block): every component's label must be its block base.
    // Ground truth is exact at any size, the chain shape maximizes the
    // round count for the block diameter, and 1M nodes exercises the
    // distributed path (hash shuffles, cached rounds), not a driver toy.
    val n = 1000000L
    val block = 8L
    val edges = spark.range(n - 1).toDF("src")
      .filter(col("src") % block =!= (block - 1))
      .select(col("src"), (col("src") + 1).as("dst"))
    val cc = Components.connectedComponents(edges)
    val wrong = cc.filter(col("component") =!= (col("node") - pmod(col("node"), lit(block)))).count()
    assert(wrong == 0L)
    assert(cc.count() == n)
  }

  test("star contraction matches label propagation and union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 40
      val edgeSeq = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edgeSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.groupBy(v => find(v.toInt)).values.flatMap { vs =>
        val m = vs.min; vs.map(_ -> m)
      }.toMap
      val got = Components.starContractionComponents(edgeSeq.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("star contraction resolves a 4096-node path — a diameter far beyond the round cap") {
    // a single path 0-1-2-...-4095: label propagation reaches one hop per
    // round (4095 rounds — intractable under MaxIterations); star
    // contraction re-points whole neighborhoods each round and converges
    // in O(log n) rounds, all inside the same cap
    val n = 4096L
    val edges = spark.range(n - 1).toDF("src")
      .select(col("src"), (col("src") + 1).as("dst"))
    val cc = Components.starContractionComponents(edges)
    assert(cc.count() == n)
    assert(cc.filter(col("component") =!= 0L).count() == 0L)
  }

  test("dedupClusters: transitive closure with canonical min-doc retention") {
    // docs 1,2,3 share one text (pairwise J=1.0 — a clique), 4 is near 5
    // only via an overlapping shingle set, 6 is a singleton (not emitted)
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base),
      (4L, "one two three four five six seven"),
      (5L, "one two three four five six seven"),
      (6L, "completely unrelated content lives here alone")
    ).toDF("doc_id", "text")
    val out = Components.dedupClusters(docs, 0.7)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 2L, true), (5L, 4L, 2L, false)))
  }
}
