package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Production-shaped streaming: a file source discovered incrementally
  * across restarts (checkpointed), merged into a keep-latest parquet
  * snapshot via foreachBatch — the reference's replicate-then-repair loop
  * as a continuous pipeline.
  */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def addBatch(src: Path, n: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("fs-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, src.resolve(s"batch_$n.parquet"))
  }

  private def runOnce(src: Path, snap: Path, ckpt: Path, schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream.schema(schema).parquet(src.toString)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        StreamDedup.mergeBatchIntoSnapshot(spark, batch, snap.toString, "event_id", "ts")
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("file stream + foreachBatch merge builds a keep-latest snapshot across restarts") {
    val src = Files.createTempDirectory("fs-src")
    val snap = Files.createTempDirectory("fs-snap").resolve("snapshot")
    val ckpt = Files.createTempDirectory("fs-ckpt")
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      (2L, ts("2024-01-01 10:05:00"), "a", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    addBatch(src, 1, b1)
    runOnce(src, snap, ckpt, b1.schema)
    val s1 = spark.read.parquet(snap.toString).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s1 == Map(1L -> 1.0, 2L -> 2.0))

    // restart with a new file: event 2 re-delivered with a newer version,
    // event 3 new; checkpoint ensures batch 1 is not reprocessed
    val b2 = Seq(
      (2L, ts("2024-01-01 10:15:00"), "a", 22.0),
      (3L, ts("2024-01-01 10:20:00"), "b", 3.0)
    ).toDF("event_id", "ts", "event_type", "value")
    addBatch(src, 2, b2)
    runOnce(src, snap, ckpt, b1.schema)
    val s2 = spark.read.parquet(snap.toString).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s2 == Map(1L -> 1.0, 2L -> 22.0, 3L -> 3.0))
  }
}
