package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Text-analysis function semantics. */
class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("text").select(c.as("out")).first()

  test("bpe-ish tokenizer splits words and symbols") {
    val out = one(TextFns.bpeTokens(col("text")), "hello, world! x2")
      .getSeq[String](0)
    assert(out == Seq("hello", ",", "world", "!", "x2"))
  }

  test("shingles produce n-gram windows; short docs collapse to one") {
    val s3 = one(TextFns.shingles(TextFns.tokens(col("text"))), "a b c d")
      .getSeq[String](0)
    assert(s3 == Seq("a b c", "b c d"))
    val short = one(TextFns.shingles(TextFns.tokens(col("text"))), "a b")
      .getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("rolling hash is order-sensitive; bow fingerprint is not") {
    val rh1 = one(TextFns.rollingHash(col("text")), "a b c").getLong(0)
    val rh2 = one(TextFns.rollingHash(col("text")), "c b a").getLong(0)
    assert(rh1 != rh2)
    // hand-computed polynomial: fold of (h*131 + cp) % (2^31-1) over "abc"
    val abc = one(TextFns.rollingHash(col("text")), "abc").getLong(0)
    assert(abc == ((97L * 131 + 98) * 131 + 99) % 2147483647L)
    assert(one(TextFns.rollingHash(col("text")), "").getLong(0) == 0L)
    val fp1 = one(TextFns.bowFingerprint(col("text")), "a b c").getString(0)
    val fp2 = one(TextFns.bowFingerprint(col("text")), "c b a").getString(0)
    assert(fp1 == fp2)
  }

  test("language-ID picks the profile with most stopword hits") {
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "der hund und die katze ist da").getString(0) == "de")
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "the cat and the dog is a pet").getString(0) == "en")
    assert(one(TextFns.langId(TextFns.tokens(col("text"))),
      "xyzzy plugh").getString(0) == "und")
  }

  // corpus-statistics operators over a constructed corpus: 100 docs with
  // 1..100 tokens ("w w w ..."), langs alternating en/de
  private lazy val corpus = spark.range(1, 101).selectExpr(
    "id AS doc_id",
    "array_join(array_repeat('w', CAST(id AS INT)), ' ') AS text",
    "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang")

  test("sequence packing: shard-local contiguous token stream, deterministic") {
    val out = graft.operators.TextOps.packDocuments(corpus, ctxTokens = 64,
      shards = 4).collect()
    assert(out.length == 100)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("shard") == r.getAs[Long]("doc_id") % 4)
        assert(r.getAs[Long]("start_tok") == cum,
          s"doc ${r.getAs[Long]("doc_id")} in shard $shard: token stream must be gapless")
        assert(r.getAs[Long]("pack_id") == cum / 64)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    val again = graft.operators.TextOps.packDocuments(corpus, 64, 4).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("global packing: block prefix sum reproduces the single global running sum") {
    // ground truth: docs ordered by id, exclusive global cumsum of 1..100
    val expected = (1L to 100L).map { id =>
      val start = (id - 1) * id / 2 // sum of 1..(id-1)
      (id, id, start, start / 128)
    }.toSet
    def run(nBlocks: Int, input: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.packGlobal(input, tokensPerShard = 128L,
          nBlocks = nBlocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(run(7, corpus) == expected)
    // block count is a parallelism knob, never a semantics knob
    assert(run(1, corpus) == expected)
    assert(run(1000, corpus) == expected) // more blocks than docs
    // partition-layout invariance: the offsets compose the same however
    // the input is scattered
    assert(run(7, corpus.repartition(13)) == expected)
    // sparse, non-contiguous ids: the monotone block mapping needs no
    // density assumption
    val sparse = corpus.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") * 1000000L - 7L)
    val got = run(5, sparse)
    assert(got.map(_._3) == expected.map(_._3)) // same offsets, shifted ids
    // empty input → empty output, schema intact
    val empty = graft.operators.TextOps.packGlobal(
      corpus.filter("doc_id < 0"), 128L, 4)
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tokens", "start_tok", "shard_id") && empty.count() == 0)
  }

  test("token ids: frequency-ranked vocab, OOV → 0, positions preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a b rare")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextOps.tokenIds(docs, vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // vocab by (count desc, token): b=4 → id 1, a=3 → id 2; c and rare OOV
    assert(out == Map(
      (1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (1L, 4L) -> 2L, (1L, 5L) -> 2L, (1L, 6L) -> 0L,
      (2L, 1L) -> 2L, (2L, 2L) -> 1L, (2L, 3L) -> 0L))
  }

  test("chunking: stride windows, clamped tail, overlap carried") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.chunkDocuments(docs, chunkTokens = 4,
        overlapTokens = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: 10 tokens, stride 3 → starts 0,3,6,9; tail clamps to 1 token
    assert(out(1L -> 0L) == (0L, 4L, "t1 t2 t3 t4"))
    assert(out(1L -> 1L) == (3L, 4L, "t4 t5 t6 t7"))
    assert(out(1L -> 2L) == (6L, 4L, "t7 t8 t9 t10"))
    assert(out(1L -> 3L) == (9L, 1L, "t10"))
    // doc 2 fits in one window
    assert(out(2L -> 0L) == (0L, 2L, "a b"))
    assert(out.size == 5)
  }

  test("stratified sample: per-stratum rates, dropped strata, rate 1.0 keeps all") {
    val out = graft.operators.TextOps.stratifiedSample(
      corpus, "doc_id", "lang", Map("en" -> 1.0, "de" -> 0.3))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") == 50, "rate 1.0 must keep every row of the stratum")
    assert(out.getOrElse("de", 0L) > 0 && out("de") < 50, "partial-rate stratum")
    // unlisted strata are dropped entirely
    val none = graft.operators.TextOps.stratifiedSample(
      corpus, "doc_id", "lang", Map("en" -> 0.5)).filter($"lang" === "de").count()
    assert(none == 0)
    // deterministic: same rows on rerun
    val a = graft.operators.TextOps.stratifiedSample(
      corpus, "doc_id", "lang", Map("en" -> 0.4, "de" -> 0.6))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.TextOps.stratifiedSample(
      corpus, "doc_id", "lang", Map("en" -> 0.4, "de" -> 0.6))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("token quantiles are exact interpolated percentiles") {
    val q = graft.operators.TextOps.tokenQuantiles(corpus).first()
    // lengths 1..100: p50 = 50.5, p90 = 90.1, p99 = 99.01
    assert(q.getAs[Double]("p50") == 50.5)
    assert(q.getAs[Double]("p90") == 90.1)
    assert(q.getAs[Double]("p99") == 99.01)
  }

  test("quality deciles cover 1..10 and are balanced") {
    val d = graft.operators.TextOps.qualityDeciles(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val byDecile = d.groupBy("decile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDecile.keySet.subsetOf((1L to 10L).toSet))
    assert(byDecile.keySet.size >= 8) // rounding ties may merge a boundary
    assert(byDecile.values.sum == d.count())
  }

  test("deterministic sample is reproducible and roughly the asked fraction") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val s1 = graft.operators.TextOps
      .deterministicSample(docs, "doc_id", "199a").select("doc_id").collect()
    val s2 = graft.operators.TextOps
      .deterministicSample(docs, "doc_id", "199a").select("doc_id").collect()
    assert(s1.map(_.getLong(0)).toSet == s2.map(_.getLong(0)).toSet)
    val frac = s1.length.toDouble / docs.count()
    assert(frac > 0.02 && frac < 0.25, s"got $frac")
  }

  test("groupSplit is leakage-safe, total, and insertion-stable") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val split = graft.operators.TextOps.groupSplit(docs, "source", 0.8, 0.1)
    // total: every row gets exactly one of the three labels
    assert(split.filter(!col("split").isin("train", "val", "test")).count() == 0)
    assert(split.count() == docs.count())
    // leakage-safe: a source never straddles splits
    val straddlers = split.groupBy("source")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0, "a group landed in two splits")
    // insertion-stable: assignment is per-group content hash, so dropping
    // half the corpus moves NO surviving row's split
    val half = graft.operators.TextOps
      .groupSplit(docs.filter(col("doc_id") % 2 === 0), "source", 0.8, 0.1)
    val moved = half.select("doc_id", "split")
      .join(split.select(col("doc_id"), col("split").as("full_split")), "doc_id")
      .filter(col("split") =!= col("full_split")).count()
    assert(moved == 0, "split assignment must not depend on the corpus")
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.groupSplit(docs, "source", 0.9, 0.1)
    }
  }

  test("language token mix shares sum to 1") {
    val m = graft.operators.TextOps.langTokenMix(corpus).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 100L)
    assert(m.map(_.getAs[Long]("total_tokens")).sum == 5050L)
    val share = m.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(share - 1.0) < 1e-5)
  }

  test("token idf decreases with document frequency") {
    val docs = Seq("a b", "a b", "a c", "a d").toDF("text")
    val idf = graft.operators.TextOps.tokenIdf(docs, 1L).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("df"), r.getAs[Double]("idf"))).toMap
    assert(idf("a")._1 == 4L && idf("b")._1 == 2L && idf("c")._1 == 1L)
    assert(idf("a")._2 < idf("b")._2 && idf("b")._2 < idf("c")._2)
    assert(idf("a")._2 == 0.0) // ln(5/5)
  }

  test("normalizeText collapses whitespace, trims, lowercases — and never shuffles") {
    import graft.operators.TextOps
    val docs = Seq((1L, "  The  QUICK\t brown\nfox  "), (2L, "already clean"))
      .toDF("doc_id", "text")
    val out = TextOps.normalizeText(docs).orderBy("doc_id")
      .select("norm_text").as[String].collect()
    assert(out(0) == "the quick brown fox")
    assert(out(1) == "already clean") // fixed point on clean input
    val shuffles = TextOps.normalizeText(docs).queryExecution.executedPlan
      .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(shuffles.isEmpty)
  }

  test("redactPii replaces email/IP/phone with typed tags and counts each") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "mail me at bob@x.co or 10.0.0.1 tel 555-123-4567"),
      (2L, "no pii here 12.34 and 555-12")).toDF("doc_id", "text")
    val rows = TextOps.redactPii(docs).orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_emails") == 1L)
    assert(rows(0).getAs[Long]("n_ips") == 1L)
    assert(rows(0).getAs[Long]("n_phones") == 1L)
    assert(rows(0).getAs[String]("redacted_text") ==
      "mail me at [EMAIL] or [IP] tel [PHONE]")
    assert(rows(1).getAs[Long]("n_emails") == 0L)
    assert(rows(1).getAs[Long]("n_ips") == 0L)
    assert(rows(1).getAs[Long]("n_phones") == 0L)
    assert(rows(1).getAs[String]("redacted_text") == rows(1).getAs[String]("text"))
  }

  test("dedupChunks groups identical passages across documents") {
    import graft.operators.TextOps
    val docs = Seq(
      (3L, "shared boiler plate"), (4L, "shared boiler plate"),
      (5L, "unique words only")).toDF("doc_id", "text")
    val rows = TextOps.dedupChunks(docs, 8, 0).collect()
    assert(rows.length == 2) // two distinct chunk contents
    val dup = rows.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("n_docs") == 2L)
    assert(dup.getAs[Long]("first_doc") == 3L)
  }
}
