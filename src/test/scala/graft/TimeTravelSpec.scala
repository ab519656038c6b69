package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.{AtomicRenameCommitter, VersionedCommitter}

/** Snapshot versioning / time travel on the manifest protocol: every
  * commit archives an immutable manifest copy, historical versions stay
  * exactly readable through GC cycles, retention expires them, and a
  * history gap (crash between flip and archive, or a history-unaware
  * writer) self-heals at the next commit.
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.selectExpr("day", "id", "version").as[(String, Long, Long)].collect().toSet

  private def delta(t: (String, Long, Long)*) =
    t.map { case (d, i, v) => (d, i, v.toDouble, v) }
      .toDF("day", "id", "value", "version")

  private def upsert(path: String, c: VersionedCommitter,
                     t: (String, Long, Long)*): Unit =
    Upsert.upsertPartitionsAtomic(spark, delta(t: _*), path, "day",
      keys = Seq("id"), order = Seq("version"), committer = c)

  test("each commit is readable as-of, exactly as it was, through later GC cycles") {
    val path = Files.createTempDirectory("graft-tt").toString + "/t"
    val c = new VersionedCommitter
    upsert(path, c, ("d1", 1L, 100L), ("d2", 2L, 100L)) // v1
    upsert(path, c, ("d1", 1L, 101L), ("d3", 3L, 101L)) // v2: update + new day
    upsert(path, c, ("d2", 2L, 102L))                   // v3: rewrite d2

    assert(c.versions(path) == Seq(1L, 2L, 3L))
    assert(rows(Upsert.readTableAsOf(spark, path, 1L, c)) ==
      Set(("d1", 1L, 100L), ("d2", 2L, 100L)))
    assert(rows(Upsert.readTableAsOf(spark, path, 2L, c)) ==
      Set(("d1", 1L, 101L), ("d2", 2L, 100L), ("d3", 3L, 101L)))
    assert(rows(Upsert.readTableAsOf(spark, path, 3L, c)) ==
      Set(("d1", 1L, 101L), ("d2", 2L, 102L), ("d3", 3L, 101L)))
    // current == newest version
    assert(rows(Upsert.readTable(spark, path, c)) ==
      rows(Upsert.readTableAsOf(spark, path, 3L, c)))
  }

  test("retention expires old versions and the next GC cycle releases their exclusive data") {
    val path = Files.createTempDirectory("graft-tt").toString + "/t"
    val c = new VersionedCommitter(retain = 2)
    upsert(path, c, ("d1", 1L, 100L)) // v1
    upsert(path, c, ("d1", 1L, 101L)) // v2 — d1@100's dir now ONLY in v1
    upsert(path, c, ("d1", 1L, 102L)) // v3 — v1 expired at this commit

    assert(c.versions(path) == Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      Upsert.readTableAsOf(spark, path, 1L, c)
    }
    // v1's exclusive dir is unreferenced now; the NEXT cycle's GC frees it
    upsert(path, c, ("d1", 1L, 103L)) // v4 (v2 expired)
    assert(rows(Upsert.readTableAsOf(spark, path, 3L, c)) ==
      Set(("d1", 1L, 102L)))
    val batchDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
    // retained versions (3, 4) reference exactly two batch dirs; v1/v2's are gone
    assert(batchDirs.length == 2,
      s"expected 2 retained batch dirs, got ${batchDirs.map(_.getName).mkString(",")}")
  }

  test("history-unaware commits self-heal into the version log at the next commit") {
    val path = Files.createTempDirectory("graft-tt").toString + "/t"
    val c = new VersionedCommitter
    upsert(path, c, ("d1", 1L, 100L)) // v1
    // a writer without history bypasses the versioned layer (or: the crash
    // window between the current flip and the archive write)
    Upsert.upsertPartitionsAtomic(spark, delta(("d1", 1L, 101L)), path, "day",
      keys = Seq("id"), order = Seq("version"), committer = AtomicRenameCommitter)
    assert(c.versions(path) == Seq(1L)) // gap: current ≠ any version

    upsert(path, c, ("d1", 1L, 102L)) // heals the gap, then commits
    assert(c.versions(path) == Seq(1L, 2L, 3L))
    assert(rows(Upsert.readTableAsOf(spark, path, 2L, c)) ==
      Set(("d1", 1L, 101L)), "the healed version must be the bypassed state")
    assert(rows(Upsert.readTableAsOf(spark, path, 3L, c)) ==
      Set(("d1", 1L, 102L)))
  }

  test("whole-table atomic snapshots version the same way") {
    val path = Files.createTempDirectory("graft-tt").toString + "/t"
    val c = new VersionedCommitter
    Upsert.writeTableAtomic(spark,
      delta(("d1", 1L, 100L)), path, committer = c, meta = Map("batch" -> "7"))
    Upsert.writeTableAtomic(spark, delta(("d1", 1L, 101L)), path, committer = c)
    assert(c.versions(path) == Seq(1L, 2L))
    assert(rows(Upsert.readTableAsOf(spark, path, 1L, c)) ==
      Set(("d1", 1L, 100L)))
    assert(rows(Upsert.readTable(spark, path, c)) == Set(("d1", 1L, 101L)))
    // metadata rides the archived manifest too
    assert(c.readManifestAsOf(path, 1L).get("__batch").contains("7"))
  }
}
