package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pipeline, Upsert}
import graft.sources.Tables
import graft.streaming.{StreamDedup, StreamStar}

/** The closing of the streaming→incremental loop (r11 verdict #3): a
  * foreachBatch-maintained star must end byte-equal to the batch
  * pipeline's star over the same events — including across a stream
  * restart from checkpoint — while only rewriting the day partitions
  * each micro-batch touches.
  */
class StreamStarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def addFile(src: Path, n: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("ss-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, src.resolve(s"batch_$n.parquet"))
  }

  private def runOnce(src: Path, root: String, ckpt: Path,
                      schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one landed file per micro-batch
      .parquet(src.toString)
    StreamStar.maintainStar(spark, stream, root, ckpt.toString)
      .awaitTermination()
  }

  test("foreachBatch star maintenance ≡ batch pipeline star, across restart") {
    val sf = "/root/testdata/sf0.001"

    // ground truth: the batch pipeline over the full events table
    val pipeOut = Files.createTempDirectory("ss-pipe").toString
    Pipeline.run(spark, sf, pipeOut)

    // the same events as three time-ordered replication windows
    val ev = Tables.events(spark, sf)
      .withColumn("__b", ntile(3).over(Window.orderBy("ts", "event_id")))
    val chunks = (1 to 3).map(i => ev.filter(col("__b") === i).drop("__b"))

    val src = Files.createTempDirectory("ss-src")
    val ckpt = Files.createTempDirectory("ss-ckpt")
    val root = Files.createTempDirectory("ss-root").toString

    // first run: windows 1+2 land, two micro-batches
    addFile(src, 1, chunks(0))
    addFile(src, 2, chunks(1))
    runOnce(src, root, ckpt, chunks(0).schema)
    val starAfter2 = Upsert.readTable(spark, s"$root/fact_events_star").count()
    assert(starAfter2 > 0 && starAfter2 < ev.count(),
      "mid-stream star should hold only the first two windows")

    // RESTART from checkpoint: window 3 lands; 1+2 must not reprocess
    addFile(src, 3, chunks(2))
    runOnce(src, root, ckpt, chunks(0).schema)

    type StarRow = (String, String, Long, Long, Double, Long)
    def rows(df: DataFrame): Set[StarRow] = df
      .select(col("user_key"), col("event_type_key"),
        col("date_key").cast("long"), col("event_id"),
        col("measure_value"), col("ts_us"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet

    val streamed = rows(Upsert.readTable(spark, s"$root/fact_events_star"))
    val batch = rows(spark.read.parquet(s"$pipeOut/fact_events_star"))
    assert(streamed.size == batch.size && streamed == batch,
      "continuous star must equal the batch pipeline star")

    // dims converge to the batch CTAS snapshots too
    def dimRows(df: DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    Seq("dim_user", "dim_event_type", "dim_date").foreach { d =>
      val cols = spark.read.parquet(s"$pipeOut/$d").columns.sorted.map(col)
      assert(
        dimRows(Upsert.readTable(spark, s"$root/$d").select(cols.toIndexedSeq: _*)) ==
          dimRows(spark.read.parquet(s"$pipeOut/$d").select(cols.toIndexedSeq: _*)),
        s"streamed $d must equal the batch pipeline's $d")
    }
  }

  test("a micro-batch only replaces the star partitions of its touched days") {
    import spark.implicits._
    val root = Files.createTempDirectory("ss-inc").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "click", 1.0, """{"k":"55"}"""),
      (2L, ts("2024-01-02 11:00:00"), 11L, "view", 2.0, """{"k":"55"}"""),
      (3L, ts("2024-01-05 12:00:00"), 12L, "click", 3.0, """{"k":"55"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    StreamStar.upsertStarBatch(spark, b1, root)
    val m1 = graft.streaming.AtomicRenameCommitter
      .readManifest(s"$root/fact_events_star")
    // data entries only — `__schema` rides every commit since evolution
    assert(m1.keySet.filterNot(_.startsWith("__")) ==
      Set("20240101", "20240102", "20240105"))

    // batch touching only 01-05 (+ its predecessor 01-04, empty): the
    // 01-01/01-02 star partitions keep their manifest entries verbatim
    val b2 = Seq(
      (4L, ts("2024-01-05 13:00:00"), 12L, "view", 4.0, """{"k":"55"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    StreamStar.upsertStarBatch(spark, b2, root)
    val m2 = graft.streaming.AtomicRenameCommitter
      .readManifest(s"$root/fact_events_star")
    assert(m2("20240101") == m1("20240101") && m2("20240102") == m1("20240102"),
      "untouched star day partitions must not be rewritten")
    assert(m2("20240105") != m1("20240105"))
    val day5 = Upsert.readTable(spark, s"$root/fact_events_star")
      .filter($"date_key" === 20240105L).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(day5 == Set(3L, 4L))
  }
}
