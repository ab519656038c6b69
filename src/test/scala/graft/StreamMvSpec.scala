package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{IncrementalMv, Upsert}
import graft.sources.Tables
import graft.streaming.{StreamMv, VersionedCommitter}

/** Continuous MV maintenance: streaming micro-batches advance the source
  * AND its rollup; the final MV must equal a one-shot batch rollup of the
  * same events, the cursor must advance per batch (continuous, not
  * drain-then-rebuild), and a checkpoint restart must replay without
  * double counting.
  */
class StreamMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val groups = Seq("day")
  private def aggs = Seq(
    sum(col("value_cents")).as("sum_cents"), count(lit(1)).as("cnt"))
  private val keys = Seq("event_id")
  private val order = Seq("ts_us", "value_cents")

  private def shaped(df: DataFrame): DataFrame = df.select(
    col("event_id"), unix_micros(col("ts")).as("ts_us"),
    round(col("value") * 100).cast("long").as("value_cents"),
    date_format(col("ts"), "yyyyMMdd").as("day"))

  private def addFile(src: Path, n: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("smv-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, src.resolve(s"batch_$n.parquet"))
  }

  private def runOnce(src: Path, root: String, ckpt: Path, c: VersionedCommitter,
                      schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    StreamMv.maintainMv(spark, stream, s"$root/src", s"$root/mv", "day",
      keys, order, groups, aggs, ckpt.toString, c).awaitTermination()
  }

  test("streamed MV ≡ one-shot batch rollup, advancing per batch, across restart") {
    val ev = shaped(Tables.events(spark, "/root/testdata/sf0.001"))
    // three time-ordered windows with an overlap re-send (idempotence)
    val n = ev.count()
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts_us", "event_id")
    val ranked = ev.withColumn("__r", row_number().over(w))
    val chunks = Seq(
      ranked.filter(col("__r") <= n / 3).drop("__r"),
      ranked.filter(col("__r") > n / 4 && col("__r") <= 2 * n / 3).drop("__r"),
      ranked.filter(col("__r") > 2 * n / 3).drop("__r"))

    val src = Files.createTempDirectory("smv-src")
    val ckpt = Files.createTempDirectory("smv-ckpt")
    val root = Files.createTempDirectory("smv-root").toString
    val c = new VersionedCommitter

    addFile(src, 1, chunks(0))
    addFile(src, 2, chunks(1))
    runOnce(src, root, ckpt, c, chunks(0).schema)
    // continuous: after two micro-batches the cursor sits at source v2
    // and the MV matches the source-so-far rollup exactly
    assert(IncrementalMv.cursor(s"$root/mv").contains(2L),
      "two micro-batches must have advanced the MV cursor to source v2")
    def mvRows = Upsert.readTable(spark, s"$root/mv")
      .collect().map(r => (r.getAs[String]("day"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("cnt"))).toSet
    def rollupOf(df: DataFrame) = df.groupBy("day")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => (r.getAs[String]("day"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("cnt"))).toSet
    assert(mvRows == rollupOf(Upsert.readTable(spark, s"$root/src")),
      "mid-stream MV must equal the rollup of the source so far")
    val midSize = mvRows.size

    // RESTART from checkpoint: window 3 lands; 1+2 must not reprocess
    addFile(src, 3, chunks(2))
    runOnce(src, root, ckpt, c, chunks(0).schema)
    assert(mvRows == rollupOf(ev),
      "final MV must equal the one-shot rollup of all events")
    assert(mvRows.size >= midSize)
    // exactly-once: the overlap window re-sent keys; counts must not
    // double (rollupOf(ev) already pins this — assert cursor sanity too)
    assert(IncrementalMv.cursor(s"$root/mv").contains(
      c.versions(s"$root/src").max))
  }

  test("an empty batch before any source commit is a no-op, not a crash") {
    val root = Files.createTempDirectory("smv-empty").toString
    val c = new VersionedCommitter
    val empty = shaped(Tables.events(spark, "/root/testdata/sf0.001")).limit(0)
    val st = StreamMv.upsertMvBatch(spark, empty, s"$root/src", s"$root/mv",
      "day", keys, order, groups, aggs, c)
    assert(!st.applied && st.touchedPartitions.isEmpty,
      "no source, nothing to refresh — the streaming query must survive")
  }

  test("replayed micro-batch converges: same source state, cursor-only refresh") {
    val ev = shaped(Tables.events(spark, "/root/testdata/sf0.001")).limit(100)
    val root = Files.createTempDirectory("smv-replay").toString
    val c = new VersionedCommitter
    val st1 = StreamMv.upsertMvBatch(spark, ev, s"$root/src", s"$root/mv",
      "day", keys, order, groups, aggs, c)
    assert(st1.applied)
    val before = Upsert.readTable(spark, s"$root/mv").collect().toSet
    // replay the identical batch: keep-latest merge → identical data,
    // one more version; the refresh sees an empty diff
    val st2 = StreamMv.upsertMvBatch(spark, ev, s"$root/src", s"$root/mv",
      "day", keys, order, groups, aggs, c)
    assert(st2.touchedPartitions.isEmpty,
      s"a replayed batch must touch no MV partitions: $st2")
    assert(Upsert.readTable(spark, s"$root/mv").collect().toSet == before)
  }
}
