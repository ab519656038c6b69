package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.{StreamOracle, StreamUpsert, VersionedCommitter}

/** Streaming MoR trickle ingest: every micro-batch lands as delta
  * sidecars (no partition rewrite), the batch ledger rides the same flip,
  * and a full checkpoint-loss replay reproduces the identical state.
  */
class StreamUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) = t.toSeq.toDF("day", "id", "v")

  private def freshTable(c: VersionedCommitter): String = {
    val path = Files.createTempDirectory("graft-smor").toString + "/t"
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d1", 2L, 20L), ("d2", 3L, 30L), ("d2", 4L, 40L)),
      path, "day", Seq("id"), Seq("v"), c)
    path
  }

  private def rows(path: String, c: VersionedCommitter) =
    Upsert.readTable(spark, path, c).selectExpr("day", "id", "v")
      .as[(String, Long, Long)].collect().toSet

  private def drain(updDir: String, path: String, ckpt: String,
                    c: VersionedCommitter): Unit =
    StreamUpsert.maintainMor(spark,
      StreamOracle.fileStream(spark, updDir, maxFilesPerTrigger = Some(1)),
      path, "day", Seq("id"), Seq("v"), ckpt, c).awaitTermination()

  test("drained stream lands sidecars only and equals the batch merge") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    val dataBefore = c.readManifest(path).filterNot(_._1.startsWith("__"))
    val updDir = Files.createTempDirectory("graft-smor-upd").toString
    // two files → two micro-batches at maxFilesPerTrigger=1
    df(("d1", 2L, 21L)).write.parquet(s"$updDir/f1")
    df(("d2", 5L, 50L)).write.parquet(s"$updDir/f2")
    // flat dir of files for the file stream
    val flat = Files.createTempDirectory("graft-smor-flat").toString
    Seq("f1", "f2").foreach { f =>
      new java.io.File(s"$updDir/$f").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (p, i) =>
          java.nio.file.Files.copy(p.toPath,
            java.nio.file.Paths.get(s"$flat/$f-$i.parquet"))
        }
    }
    val ckpt = Files.createTempDirectory("graft-smor-ckpt").toString
    drain(flat, path, ckpt, c)
    assert(c.readManifest(path).filterNot(_._1.startsWith("__")) == dataBefore,
      "no data dir may rewrite")
    assert(c.readManifest(path).keySet.exists(_.startsWith("__delta.")))
    val expect = Set(("d1", 1L, 10L), ("d1", 2L, 21L), ("d2", 3L, 30L),
      ("d2", 4L, 40L), ("d2", 5L, 50L))
    assert(rows(path, c) == expect)
    // the ledger carries the last applied batch id, atomic with its data
    assert(Upsert.tableMeta(path, c).contains("mor_batch"))

    // same checkpoint, no new files: draining again applies nothing
    val manifestBefore = c.readManifest(path)
    drain(flat, path, ckpt, c)
    assert(c.readManifest(path) == manifestBefore)

    // checkpoint loss: every batch re-offers; the ledger skips the last,
    // the pre-merged sidecars absorb the rest — state is bit-identical
    val ckpt2 = Files.createTempDirectory("graft-smor-ckpt2").toString
    drain(flat, path, ckpt2, c)
    assert(rows(path, c) == expect)
  }
}
