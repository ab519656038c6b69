package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream watermarked interval join: single-batch drain equals the
  * batch interval join; buffered join state survives a restart through the
  * checkpoint; the watermark both drops late input and bounds state.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def addBatch(src: Path, n: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("sj-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, src.resolve(s"batch_$n.parquet"))
  }

  /** One AvailableNow drain of the interval join over the file source,
    * appended to a parquet sink under a PERSISTENT checkpoint — the
    * restart seam: a second call resumes source offsets, watermark, and
    * the buffered join state from `ckpt`.
    */
  private def runOnce(src: Path, out: Path, ckpt: Path,
                      schema: org.apache.spark.sql.types.StructType,
                      windowMinutes: Int, delay: String): Unit = {
    def side(t: String) = spark.readStream.schema(schema)
      .parquet(src.toString).filter(col("event_type") === t)
    val q = StreamJoin.intervalJoin(side("click"), side("purchase"),
        windowMinutes, delay)
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def pairs(out: Path): Set[(Long, Long)] =
    spark.read.parquet(out.toString).collect()
      .map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet

  test("join state survives a restart: a purchase arriving after restart matches a pre-restart click") {
    val src = Files.createTempDirectory("sj-src")
    val out = Files.createTempDirectory("sj-out")
    val ckpt = Files.createTempDirectory("sj-ckpt")
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    addBatch(src, 1, b1)
    runOnce(src, out, ckpt, b1.schema, windowMinutes = 30, delay = "1 hour")
    assert(pairs(out).isEmpty, "no purchase yet — nothing to emit")

    // restart: the purchase is in a NEW file; the click is NOT re-read
    // (source offsets checkpointed), so the match can only come from the
    // checkpointed join state
    val b2 = Seq(
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    addBatch(src, 2, b2)
    runOnce(src, out, ckpt, b1.schema, windowMinutes = 30, delay = "1 hour")
    assert(pairs(out) == Set((1L, 2L)),
      "cross-restart match must come from checkpointed join state")
  }

  test("watermark drops late rows and evicts out-of-window join state") {
    val src = Files.createTempDirectory("sj-src2")
    val out = Files.createTempDirectory("sj-out2")
    val ckpt = Files.createTempDirectory("sj-ckpt2")
    // run 1: a click at 10:00 plus far-future rows on BOTH sides — the
    // global watermark is the MIN across inputs, so each side needs an
    // event-time observation to push it to 22:00 (delay 1 h) at the
    // batch boundary
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (9L, ts("2024-01-01 23:00:00"), 9L, "click", 0.0),
      (8L, ts("2024-01-01 23:00:00"), 8L, "purchase", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    addBatch(src, 1, b1)
    runOnce(src, out, ckpt, b1.schema, windowMinutes = 30, delay = "1 hour")

    // run 2: u7's purchase is 12 h below the watermark — late input, and
    // its matching click's state is past wm − window and evictable; u9's
    // purchase is within window and on time → the only emitted match
    val b2 = Seq(
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase", 5.0),
      (10L, ts("2024-01-01 23:05:00"), 9L, "purchase", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    addBatch(src, 2, b2)
    runOnce(src, out, ckpt, b1.schema, windowMinutes = 30, delay = "1 hour")
    assert(pairs(out) == Set((9L, 10L)),
      "late purchase must be dropped; on-time one must match")
  }

  test("left-outer emission boundary: null-extension requires close strictly before the final watermark") {
    // window 30 min, delay 1 h; both sides carry a 23:00 row so the final
    // watermark is 22:00. Clicks: c1 closes 10:30 (≪ wm → null-emits),
    // c2 closes exactly 22:00 (== wm → stays open, not emitted),
    // c3 matches (emits matched regardless of watermark)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 21:30:00"), 2L, "click", 0.0),
      (3L, ts("2024-01-01 21:40:00"), 3L, "click", 0.0),
      (30L, ts("2024-01-01 21:41:00"), 3L, "purchase", 5.0),
      (90L, ts("2024-01-01 23:00:00"), 9L, "click", 0.0),
      (91L, ts("2024-01-01 23:00:00"), 8L, "purchase", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val staged = graft.streaming.StreamOracle.stage(spark, ev, "sj_outer_boundary")
    def side(t: String) = graft.streaming.StreamOracle
      .fileStream(spark, staged).filter(col("event_type") === t)
    val out = graft.streaming.StreamOracle.drainAppend(spark,
        StreamJoin.intervalJoinLeftOuter(side("click"), side("purchase"), 30, "1 hour"))
      .collect().map(r => (r.getAs[Long]("l_id"),
        Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong))).toSet
    assert(out == Set((1L, None), (3L, Some(30L))),
      s"c1 null-emits, c2 (close == wm) stays open, c3 matches: got $out")
  }

  test("single-batch drain equals the batch interval join (the oracle contract)") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val staged = graft.streaming.StreamOracle.stage(spark, ev, "sj_events")
    def side(t: String) = graft.streaming.StreamOracle
      .fileStream(spark, staged).filter(col("event_type") === t)
    val streamed = graft.streaming.StreamOracle.drainAppend(spark,
        StreamJoin.intervalJoin(side("click"), side("purchase"), 360, "30 minutes"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val l = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ru"), col("event_id").as("r_id"), col("ts").as("r_ts"))
    val batch = l.join(r, col("user_id") === col("ru") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 360 MINUTES"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must produce at least one match")
  }

  test("stream-static enrichment drain equals the batch join and broadcasts the dim") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val dim = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
    // the same function on a batch frame shows the plan the per-trigger
    // incremental plan reuses: the dim side builds a broadcast, the fact
    // side never exchanges
    val batchPlan = StreamJoin.enrichWithDim(ev, dim, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"), batchPlan.takeRight(600))
    val staged = graft.streaming.StreamOracle.stage(spark, ev, "sj_enrich")
    val streamed = graft.streaming.StreamOracle.drainAppend(spark,
        StreamJoin.enrichWithDim(
          graft.streaming.StreamOracle.fileStream(spark, staged), dim, Seq("user_id")))
      .select("event_id", "seg").as[(Long, String)].collect().toSet
    val batch = ev.join(dim, Seq("user_id"))
      .select("event_id", "seg").as[(Long, String)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must enrich at least one event")
  }
}
