package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.{CasCommitter, ConcurrentCommitException}

/** The conditional-put commit (CasCommitter): a concurrent writer's
  * interleaved commit must surface as ConcurrentCommitException with the
  * winner's manifest intact — never lost, never torn — and the loser's
  * full-cycle retry must converge. Drops the AtomicRenameCommitter's
  * single-writer assumption with the same protocol the trait doc
  * prescribes for S3-class stores.
  */
class CasCommitterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaved commit loses with the winner's manifest intact; retry converges") {
    val path = Files.createTempDirectory("cas").toString + "/t"
    val a = new CasCommitter
    val b = new CasCommitter

    // seed through A so both writers observe the same committed state
    Upsert.writeTableAtomic(spark, Seq((1L, "v1")).toDF("id", "v"), path, a)
    b.readManifest(path)

    // A begins a cycle (observes current state)...
    a.readManifest(path)
    // ...B completes a full write in the window
    Upsert.writeTableAtomic(spark, Seq((1L, "from-b")).toDF("id", "v"), path, b)
    // A's commit must now fail the precondition
    intercept[ConcurrentCommitException] {
      a.commit(path, Map("all" -> "batch-deadbeef/data"))
    }
    def read() = Upsert.readTable(spark, path, new CasCommitter)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(read() == Set((1L, "from-b")), "the winner's commit must survive")

    // the loser retries its WHOLE cycle (re-read -> re-stage -> commit)
    Upsert.writeTableAtomic(spark, Seq((1L, "from-a-retry")).toDF("id", "v"), path, a)
    assert(read() == Set((1L, "from-a-retry")))
  }

  test("single-writer protocols run unchanged under the CAS committer") {
    val path = Files.createTempDirectory("cas-single").toString + "/t"
    val c = new CasCommitter
    val d1 = Seq(("d1", 1L, 1.0, 100L)).toDF("day", "id", "value", "version")
    Upsert.upsertPartitionsAtomic(spark, d1, path, "day",
      keys = Seq("id"), order = Seq("version"), committer = c)
    val d2 = Seq(("d1", 1L, 2.0, 101L), ("d2", 2L, 9.0, 100L))
      .toDF("day", "id", "value", "version")
    Upsert.upsertPartitionsAtomic(spark, d2, path, "day",
      keys = Seq("id"), order = Seq("version"), committer = c)
    val rows = Upsert.readTable(spark, path, c)
      .select("id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1L, 2.0), (2L, 9.0)))
  }

  test("a stale observation cannot clobber a newer table (lost-update guard)") {
    val path = Files.createTempDirectory("cas-stale").toString + "/t"
    val a = new CasCommitter
    // A observes ABSENT, someone else creates the table, A's create must fail
    a.readManifest(path)
    Upsert.writeTableAtomic(spark, Seq((7L, "x")).toDF("id", "v"), path,
      new CasCommitter)
    intercept[ConcurrentCommitException] {
      a.commit(path, Map("all" -> "batch-cafebabe/data"))
    }
  }
}
