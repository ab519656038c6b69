package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Semantics of the round-7 curation operators: domain token budgets,
  * cross-corpus span dedup with reconstruction, rare-ngram scoring.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("domain budget keeps a deterministic prefix and caps overshoot") {
    val docs = (0L until 40L)
      .map(i => (i, ("w " * ((i % 7).toInt + 1)).trim, s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val budget = 10L
    val kept = TextOps.domainTokenBudget(docs, budget).collect()
    val byDomain = kept.groupBy(_.getAs[String]("domain"))
    assert(byDomain.keySet == Set("src0", "src1", "src2", "src3"),
      "every domain contributes while its budget lasts")
    byDomain.values.foreach { rows =>
      // each kept doc STARTS inside the budget …
      assert(rows.forall(_.getAs[Long]("cum_before") < budget))
      // … so the total can overshoot by at most the last doc
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
      assert(total < budget + maxDoc)
    }
    // unlimited budget keeps everything (greedy fill is a pure prefix rule)
    assert(TextOps.domainTokenBudget(docs, 1000000L).count() == 40)
  }

  test("span dedup keeps first occurrence only and reconstructs the rest") {
    val docs = Seq(
      (1L, "a b c d"),   // spans: "a b", "c d"
      (2L, "a b x y"),   // "a b" already seen in doc 1 → only "x y" survives
      (3L, "a b")        // fully duplicated → doc vanishes
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSpans(docs, "text", 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_spans_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(out == Map(
      1L -> ((2L, 2L, "a b c d")),
      2L -> ((2L, 1L, "x y"))))
  }

  test("span dedup reassembles surviving spans in document order") {
    val docs = Seq(
      (1L, "p q"),                  // claims "p q" first
      (2L, "m n p q r s")           // middle span duplicated → "m n … r s"
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSpans(docs, "text", 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out(2L) == "m n r s",
      "surviving spans must rejoin in original position order")
  }

  test("rare-ngram score counts corpus-rare distinct bigrams per doc") {
    val docs = Seq(
      (1L, "a b c"),   // bigrams: "a b", "b c"
      (2L, "a b d")    // bigrams: "a b", "b d"
    ).toDF("doc_id", "text")
    // df("a b") = 2, df("b c") = df("b d") = 1 → with maxDf = 1 each doc
    // has exactly one rare bigram of its two
    val out = TextOps.rareNgramScore(docs, 2, 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_distinct_ngrams"), r.getAs[Long]("n_rare"),
          r.getAs[Double]("rare_frac")))).toMap
    assert(out == Map(1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5))))
  }

  test("rare-ngram score uses DISTINCT bigrams (repetition adds nothing)") {
    val docs = Seq((1L, "a b a b a b"), (2L, "z z")).toDF("doc_id", "text")
    // doc 1's repeated "a b"/"b a" count once each; "z z" is unique to doc 2
    val out = TextOps.rareNgramScore(docs, 2, 1L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_distinct_ngrams"))
      .toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
