package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.VitalsGen
import graft.operators.Dedup

/** W1 keep-latest dedup semantics (SURVEY.md §5 property list): output keys
  * unique; survivor is the argmax of the order column; idempotent.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val overlapping = {
    // reference replication shape: 10-min cadence, 20-min lookback ⇒ each
    // event lands in two consecutive batches with different created_at
    val oltp = VitalsGen.vitals(spark, 60, startEpochSec = 1700000000L)
    val batches = (1 to 6).map { i =>
      VitalsGen.extractBatch(oltp, 1700000000L + i * 600L, lookbackMinutes = 20)
    }
    batches.reduce(_ unionByName _)
  }

  test("overlapping batches produce duplicates; dedup removes all of them") {
    val total = overlapping.count()
    val distinctIds = overlapping.select("event_id").distinct().count()
    assert(total > distinctIds, "fixture must actually contain duplicates")
    val deduped = Dedup.keepFirst(overlapping, Seq("event_id"),
      Seq(col("created_at").desc, col("event_id")))
    assert(deduped.count() == distinctIds)
    assert(deduped.groupBy("event_id").count().filter($"count" > 1).count() == 0)
  }

  test("survivor is the latest created_at per key") {
    val deduped = Dedup.keepFirst(overlapping, Seq("event_id"),
      Seq(col("created_at").desc, col("event_id")))
    val expected = overlapping.groupBy("event_id")
      .agg(max("created_at").as("created_at"))
    assert(deduped.select("event_id", "created_at")
      .except(expected).count() == 0)
  }

  test("dedup is idempotent") {
    val once = Dedup.keepFirst(overlapping, Seq("event_id"),
      Seq(col("created_at").desc, col("event_id")))
    val twice = Dedup.keepFirst(once, Seq("event_id"),
      Seq(col("created_at").desc, col("event_id")))
    assert(once.except(twice).count() == 0 && twice.except(once).count() == 0)
  }

  test("agg-based keep-latest matches the window form") {
    val win = Dedup.keepFirst(overlapping, Seq("event_id"),
      Seq(col("created_at").desc, col("value_num").desc))
    val agg = Dedup.keepLatestAgg(overlapping, Seq("event_id"),
      Seq(col("created_at"), col("value_num")))
    assert(win.except(agg).count() == 0 && agg.except(win).count() == 0)
  }

  test("exact content dedup groups identical payloads") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "different text")
    ).toDF("doc_id", "text")
    val out = Dedup.exactByContent(docs, "text", "doc_id").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("bloom-prefiltered incremental exact dedup rejects corpus duplicates only") {
    val corpus = Seq((1L, "alpha text body"), (2L, "beta text body"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha text body"),  // byte-identical to corpus 1 → rejected
      (11L, "gamma fresh body"), // new → kept
      (12L, "beta text body"),  // identical to corpus 2 → rejected
      (13L, "alpha text body?")  // one char off → kept (EXACT dedup)
    ).toDF("doc_id", "text")
    val got = Dedup.bloomNewContent(corpus, batch, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L))
  }

  test("null-content batch rows are classified new, not silently dropped") {
    val corpus = Seq((1L, "kept in corpus")).toDF("doc_id", "text")
    val batch = Seq((10L, "kept in corpus"), (11L, null.asInstanceOf[String]),
      (12L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.bloomNewContent(corpus, batch, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L),
      "the null-text row must surface as new (nothing equals null), not vanish")
  }

  test("bloom false positives never change the result (saturated sketch)") {
    // fpp = 0.5 on a 2-doc corpus → a nearly saturated few-bit sketch:
    // batch docs bloom-hit spuriously and must be saved by the exact
    // verification join, not the sketch
    val corpus = Seq((1L, "kept in corpus"), (2L, "also kept in corpus"))
      .toDF("doc_id", "text")
    val batch = (10L to 40L).map(i => (i, s"unique text number $i"))
      .toDF("doc_id", "text")
    val got = Dedup.bloomNewContent(corpus, batch, "text", fpp = 0.5)
      .count()
    assert(got == 31L, "every unique batch doc must survive a saturated bloom")
  }

  test("bloom membership probe is the native codegen'd expression, not a UDF") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    // batch from range (not a LocalRelation): ConvertToLocalRelation would
    // otherwise constant-fold the probe away before the physical plan
    val batch = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("text "), col("id")).as("text"))
    val plan = Dedup.bloomNewContent(corpus, batch, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the native BloomFilterMightContain probe in the plan:\n$plan")
    assert(!plan.contains("UDF"),
      s"the engine's row path must stay UDF-free:\n$plan")
  }
}
