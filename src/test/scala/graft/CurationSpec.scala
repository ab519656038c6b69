package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

/** Curation pipeline semantics: exact dups collapse to the lowest id,
  * near-dups are pruned greedily, low-quality docs are filtered, stats add up.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val junk = Seq.fill(30)("the a").mkString(" ") // all stopwords, tiny TTR

  test("curation drops exact dups, near dups, and low-quality docs") {
    val docs = Seq(
      (1L, base), (2L, base),      // exact dup pair → keep 1
      (3L, nearDup),               // near dup of 1 → pruned
      (4L, junk),                  // low quality → filtered
      (5L, (100 to 140).map(i => s"uniq$i").mkString(" "))
    ).toDF("doc_id", "text")
    val (curated, stages) = Curation.curate(docs, jaccardThreshold = 0.5, minQuality = 0.3)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 5L))
    assert(stages.map(s => s.stage -> s.docs) == Seq(
      "input" -> 5L, "exact_dedup" -> 4L, "near_dedup" -> 3L, "quality_filter" -> 2L))
  }

  test("fixture corpus curation keeps most docs and sums tokens") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val (curated, stages) = Curation.curate(docs)
    assert(stages.last.docs > 400, s"unexpectedly aggressive: $stages")
    val sum = Curation.summary(curated).collect()
    assert(sum.map(_.getAs[Long]("n_docs")).sum == stages.last.docs)
    assert(sum.forall(_.getAs[Long]("total_tokens") > 0))
  }

  test("curate → encode → pack composition is consistent end to end") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val (curated, stages) = Curation.curate(docs)
    val (tokenStream, packs) = Curation.prepareTrainingData(
      curated, vocabSize = 200, ctxTokens = 256, shards = 8)
    val nDocs = stages.last.docs
    // every curated doc appears in exactly one pack row and its token
    // stream length equals the pack row's token count
    val packed = packs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(packed.size == nDocs)
    val streamCounts = tokenStream.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamCounts == packed, "token stream and pack token counts must agree")
    // ids stay within [0, vocabSize]
    val ids = tokenStream.agg(
      org.apache.spark.sql.functions.min("token_id"),
      org.apache.spark.sql.functions.max("token_id")).first()
    assert(ids.getLong(0) >= 0L && ids.getLong(1) <= 200L)
  }
}
