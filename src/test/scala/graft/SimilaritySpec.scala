package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupApprox

/** Near-dup detection semantics on planted duplicates: the exact join finds
  * them, MinHash estimates track exact Jaccard, SimHash Hamming separates
  * near-dups from unrelated docs.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val unrelated = (100 to 140).map(i => s"other$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated)
  ).toDF("doc_id", "text")

  test("exact jaccard join finds the planted near-dup pair and only it") {
    val pairs = DedupApprox.jaccardJoin(docs, 0.5).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert((p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")) == (1L, 2L))
    assert(p.getAs[Double]("jaccard") > 0.85)
  }

  test("minhash LSH finds the planted pair with its exact jaccard") {
    val pairs = DedupApprox.minhashPairs(docs, 0.5).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert((p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")) == (1L, 2L))
    // exact-verified output: the emitted value is the true shingle Jaccard
    assert(p.getAs[Double]("jaccard") > 0.85)
  }

  test("exact-verified minhash output is IDENTICAL to the exact join (oracle precondition)") {
    // dedup_minhash carries the same DuckDB oracle as sim_join_jaccard —
    // which is only sound if the LSH bands catch every true pair on the
    // fixture, making LSH-candidates→exact-refine ≡ PPJoin→exact-refine
    for (sf <- Seq("0.001", "0.1")) {
      val d = graft.sources.Tables.documents(spark, s"/root/testdata/sf$sf")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
      val exact = rows(DedupApprox.jaccardJoin(d, 0.7))
      val mh = rows(DedupApprox.minhashPairs(d, 0.7))
      assert(exact.nonEmpty, "fixture must contain near-dups")
      assert(mh == exact,
        s"sf=$sf: LSH missed ${(exact -- mh).size} pairs / invented ${(mh -- exact).size}")
    }
  }

  test("sf0.1 recall gate: simhash vs exact ground truth") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the exact PPJoin at the curation threshold
    val exact = pairs(DedupApprox.jaccardJoin(d, 0.8))
    assert(exact.size > 100, s"fixture must plant near-dups, got ${exact.size}")
    // simhash approximates a different similarity (cosine of token bags), so
    // only recall against the jaccard truth is gated, not precision
    val sh = pairs(DedupApprox.simhashPairs(d, 8))
    val shRecall = exact.intersect(sh).size.toDouble / exact.size
    info(s"sf0.1 simhash: recall=$shRecall (found=${sh.size})")
    assert(shRecall >= 0.8, s"simhash recall $shRecall below gate")
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val h = DedupApprox.withSimhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sh")).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) < hamming(h(1L), h(3L)))
    assert(hamming(h(1L), h(2L)) <= 8)
  }
}
