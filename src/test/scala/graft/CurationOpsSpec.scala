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

  test("mixture sampling flattens domain shares toward sqrt weights, deterministically") {
    // skewed composition: 64 / 16 / 4 docs → sqrt weights 8 / 4 / 2
    val docs = ((0L until 64L).map(i => (i, s"t$i", "big")) ++
      (64L until 80L).map(i => (i, s"t$i", "mid")) ++
      (80L until 84L).map(i => (i, s"t$i", "small")))
      .toDF("doc_id", "text", "source")
    val out = TextOps.domainMixtureSample(docs, 28L).collect()
    val byDomain = out.groupBy(_.getAs[String]("domain")).view.mapValues(_.length).toMap
    // quotas: 28·8/14=16, 28·4/14=8, 28·2/14=4 (exact integer ratios here)
    assert(byDomain == Map("big" -> 16, "mid" -> 8, "small" -> 4), byDomain.toString)
    // flattening: the big domain's share fell (64/84 → 16/28), the small
    // domain's rose (4/84 → 4/28) — the α=1/2 rebalancing property
    assert(16.0 / 28 < 64.0 / 84 && 4.0 / 28 > 4.0 / 84)
    // per-domain selection is the md5-ordered prefix — reproducible
    val again = TextOps.domainMixtureSample(docs, 28L).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
    // a domain's quota never exceeds its doc count even at huge targets
    val all = TextOps.domainMixtureSample(docs, 10000L)
      .groupBy("domain").count().collect()
      .map(r => r.getAs[String]("domain") -> r.getLong(1)).toMap
    assert(all("small") <= 4 && all("mid") <= 16 && all("big") <= 64)
  }

  test("mixture quotas sum to the target within the half-up rounding bound") {
    // each of d quotas rounds half-up, so the total drifts from the target
    // by at most d/2 in either direction — PROVIDED no quota is capped by
    // its domain's size (√-flattening hands small domains MORE than their
    // raw share, so a large target can over-allocate a small domain; the
    // cap then shrinks the total legitimately, outside the rounding
    // bound). Pin the bound on targets kept inside the uncapped regime.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val nDomains = 2 + rnd.nextInt(5)
      val sizes = Seq.fill(nDomains)(1 + rnd.nextInt(40))
      val docs = sizes.zipWithIndex.flatMap { case (sz, d) =>
        (0 until sz).map(i => (d * 1000L + i, s"t$d-$i", s"dom$d"))
      }.toDF("doc_id", "text", "source")
      val w = sizes.map(sz => math.round(math.sqrt(sz.toDouble) * 1e6))
      val sumW = w.sum
      val maxSafe = sizes.zip(w)
        .map { case (sz, wd) => (sz.toLong * sumW) / wd }.min - nDomains
      val target = 1L + rnd.nextLong().abs % math.max(1L, maxSafe)
      val total = graft.operators.TextOps.domainMixtureSample(docs, target).count()
      assert(math.abs(total - target) <= (nDomains + 1) / 2,
        s"trial $trial: |$total - $target| > ${(nDomains + 1) / 2} (sizes=$sizes)")
    }
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

  test("LM perplexity matches the hand-computed add-one bigram model") {
    // train: "a b" ×3 and "a c" ×1 → c1(a)=4, c12(a b)=3, c12(a c)=1,
    // V = {a,b,c} = 3
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"),  // seen pair:    -ln(4/7)
      (11L, "a q"),  // unseen pair:  -ln(1/7)
      (12L, "q q"),  // unseen ctx:   -ln(1/3)
      (13L, "a")     // <2 tokens: no bigrams, must drop out
    ).toDF("doc_id", "text")
    def micro(p: Double): Long = math.round(math.log(p) * -1000000.0)
    val got = TextOps.lmPerplexity(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_micro"))))
      .toMap
    assert(got == Map(
      10L -> ((1L, micro(4.0 / 7.0))),
      11L -> ((1L, micro(1.0 / 7.0))),
      12L -> ((1L, micro(1.0 / 3.0)))))
  }

  test("LM perplexity ranks reference-like text below gibberish") {
    val train = (0L until 30L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val score = Seq(
      (100L, "the quick brown fox jumps"),
      (101L, "zxq vbn mmw qqa ppl")).toDF("doc_id", "text")
    val nll = TextOps.lmPerplexity(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_nll_micro"))
      .toMap
    assert(nll(100L) < nll(101L),
      s"in-domain text must score a lower avg NLL than gibberish: $nll")
  }
}
