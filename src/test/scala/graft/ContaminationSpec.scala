package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** Repetition metrics + benchmark-contamination scan (round-4 additions to
  * the training-data surface). Value exactness is pinned by the DuckDB
  * oracle; these tests pin the invariants and the physical shapes.
  */
class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir)

  test("repetition: fractions are valid and a synthetic repetitive doc maxes out") {
    val rows = TextOps.repetitionStats(docs).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_bigram_frac")
      val top = r.getAs[Double]("top_bigram_frac")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      // the top bigram's occurrences are part of the duplicate mass
      assert(r.getAs[Long]("n_distinct_bigrams") <= r.getAs[Long]("n_bigrams"))
    }
    // "spam spam spam spam" → one distinct bigram occurring 3 times
    val spam = spark.createDataFrame(Seq((1L, "spam spam spam spam")))
      .toDF("doc_id", "text")
    val s = TextOps.repetitionStats(spam).collect().head
    assert(s.getAs[Long]("n_bigrams") == 3L)
    assert(s.getAs[Long]("n_distinct_bigrams") == 1L)
    assert(s.getAs[Double]("dup_bigram_frac") == 0.6667)
    assert(s.getAs[Double]("top_bigram_frac") == 1.0)
  }

  test("repetition: zero-shuffle plan and exact stats on a mixed doc") {
    // "a b a b c" → bigrams (a b, b a, a b, b c): 4 total, 3 distinct, top 2
    val mixed = spark.createDataFrame(Seq((1L, "a b a b c"), (2L, "solo")))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(mixed).collect()
    assert(out.length == 1) // the 1-token doc has no bigrams and is dropped
    val m = out.head
    assert(m.getAs[Long]("n_bigrams") == 4L)
    assert(m.getAs[Long]("n_distinct_bigrams") == 3L)
    assert(m.getAs[Double]("top_bigram_frac") == 0.5)
    // per-row statistics must never shuffle: the plan is scan → project
    val plan = TextOps.repetitionStats(docs).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty,
      s"doc_repetition must be a narrow projection, found shuffles:\n$plan")
  }

  test("contamination: pairs are train×eval and shared counts positive") {
    val pairs = TextOps.contamination(docs, 5, 10L).collect()
    assert(pairs.nonEmpty, "fixture has near-dup docs spanning the split")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10L != 0L)
      assert(r.getAs[Long]("eval_id") % 10L == 0L)
      assert(r.getAs[Long]("shared_ngrams") > 0L)
    }
  }

  test("contamination: eval side broadcasts (no corpus-side shuffle for the join)") {
    val plan = TextOps.contamination(docs, 5, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval n-grams must broadcast:\n$plan")
  }

  test("contamination: refuses an eval side beyond the n-gram cap (runtime fence)") {
    // same fence pattern as Ann.embeddingNearDup: the "eval side is tiny"
    // contract must fail loudly, not OOM the executors with the broadcast
    val e = intercept[IllegalArgumentException] {
      TextOps.contamination(docs, 5, 10L, maxEvalNgrams = 10)
    }
    assert(e.getMessage.contains("exceeds 10 exploded n-grams"))
    // and the cap is about the eval side, not the corpus: a cap the eval
    // split fits under changes nothing
    assert(TextOps.contamination(docs, 5, 10L).count() ==
      TextOps.contamination(docs, 5, 10L, maxEvalNgrams = 500000).count())
  }

  test("decontaminate: removes exactly the contaminated train docs") {
    val train = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0).count()
    val contaminated = TextOps.contamination(docs, 5, 10L)
      .select("doc_id").distinct().count()
    val clean = TextOps.decontaminate(docs, 5, 10L)
    assert(clean.count() == train - contaminated)
    // nothing contaminated survives
    val survivors = clean.join(
      TextOps.contamination(docs, 5, 10L).select("doc_id").distinct(),
      Seq("doc_id"), "left_semi").count()
    assert(survivors == 0L)
  }
}
