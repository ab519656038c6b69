package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Maintenance, Upsert}
import graft.streaming.{AtomicRenameCommitter, VersionedCommitter}

/** Small-file compaction on the manifest seam: content-preserving,
  * file-count-reducing, atomic (crash leaves the old layout committed),
  * and history-preserving (as-of reads across the compaction commit
  * resolve the pre-compaction layout).
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.selectExpr("day", "id", "version").as[(String, Long, Long)].collect().toSet

  /** Commit partition contents fanned out over `nTasks` write tasks, so
    * each touched partition dir lands with up to `nTasks` files — the
    * small-file debt a micro-batch cadence accrues. (An explicit
    * `repartition(n)` — AQE never coalesces a user-specified count —
    * through the atomic replace, so the staged layout keeps the fan-out;
    * the upsert path's merge aggregate would be AQE-coalesced to one
    * task at these row counts.)
    */
  private def upsertFragmented(path: String, c: graft.streaming.SnapshotCommitter,
                               nTasks: Int, t: (String, Long, Long)*): Unit = {
    val df = t.map { case (d, i, v) => (d, i, v.toDouble, v) }
      .toDF("day", "id", "value", "version").repartition(nTasks)
    Upsert.replacePartitionsAtomic(spark, df, path, "day",
      t.map(_._1).distinct.sorted, committer = c)
  }

  test("compaction bin-packs each partition without changing its rows") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    val c = AtomicRenameCommitter
    val data = (1L to 40L).map(i => (s"d${i % 2}", i, 100L))
    upsertFragmented(path, c, 8, data: _*)

    val before = Maintenance.tableFileStats(path, c)
    assert(before.forall(_.nFiles > 1), s"fixture must start fragmented: $before")
    val pre = rows(Upsert.readTable(spark, path, c))

    val s = Maintenance.compact(spark, path, committer = c)
    assert(s.committed && s.compacted.sorted == Seq("d0", "d1"))
    val after = Maintenance.tableFileStats(path, c)
    assert(after.forall(_.nFiles == 1), s"huge target => one file per partition: $after")
    assert(s.filesBefore == before.map(_.nFiles.toLong).sum)
    assert(s.filesAfter == 2L)
    assert(rows(Upsert.readTable(spark, path, c)) == pre)
  }

  test("already-packed table is a no-op (no commit, no rewrite)") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    val c = new VersionedCommitter
    upsertFragmented(path, c, 8, (1L to 10L).map(i => ("d1", i, 100L)): _*)
    assert(Maintenance.compact(spark, path, committer = c).committed)
    val versionsAfterFirst = c.versions(path)

    val s2 = Maintenance.compact(spark, path, committer = c)
    assert(!s2.committed && s2.compacted.isEmpty && s2.bytesRewritten == 0L)
    assert(c.versions(path) == versionsAfterFirst, "a no-op must not commit a version")
  }

  test("a crash before the manifest flip leaves the old layout committed, old-only never mixed") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    val c = AtomicRenameCommitter
    val data = (1L to 20L).map(i => (s"d${i % 2}", i, 100L))
    upsertFragmented(path, c, 8, data: _*)
    val preManifest = c.readManifest(path)
    val pre = rows(Upsert.readTable(spark, path, c))

    val s = Maintenance.compactImpl(spark, path, 128L * 1024 * 1024, Nil,
      crashBeforeCommit = true, c)
    assert(!s.committed && s.compacted.nonEmpty)
    assert(c.readManifest(path) == preManifest)
    assert(rows(Upsert.readTable(spark, path, c)) == pre)

    // the next compaction GCs the crashed staging and completes
    val s2 = Maintenance.compact(spark, path, committer = c)
    assert(s2.committed)
    assert(rows(Upsert.readTable(spark, path, c)) == pre)
    assert(Maintenance.tableFileStats(path, c).forall(_.nFiles == 1))
  }

  test("time travel across the compaction commit resolves the pre-compaction layout") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    val c = new VersionedCommitter
    val v1 = (1L to 20L).map(i => (s"d${1 + i % 2}", i, 100L))
    val v2 = (1L to 20L).map(i => (s"d${1 + i % 2}", i, 101L))
    upsertFragmented(path, c, 8, v1: _*) // v1
    upsertFragmented(path, c, 8, v2: _*) // v2 replaces both days
    val preV2 = rows(Upsert.readTableAsOf(spark, path, 2L, c))
    assert(preV2 == v2.map { case (d, i, v) => (d, i, v) }.toSet)

    val s = Maintenance.compact(spark, path, committer = c)
    assert(s.committed)
    assert(c.versions(path) == Seq(1L, 2L, 3L), "compaction is just the next version")
    // the compacted current state reads the same rows...
    assert(rows(Upsert.readTable(spark, path, c)) == preV2)
    // ...and the PRE-compaction version still resolves (old dirs GC-retained)
    assert(rows(Upsert.readTableAsOf(spark, path, 2L, c)) == preV2)
    assert(rows(Upsert.readTableAsOf(spark, path, 1L, c)) == v1.toSet)
  }

  test("z-order compaction re-clusters while preserving content") {
    val path = Files.createTempDirectory("graft-cpt").toString + "/t"
    val c = AtomicRenameCommitter
    val data = (1L to 30L).map(i => (s"d${i % 2}", i, i * 7 % 13))
    upsertFragmented(path, c, 8, data: _*)
    val pre = rows(Upsert.readTable(spark, path, c))

    val s = Maintenance.compact(spark, path,
      zorderCols = Seq("id", "version"), committer = c)
    assert(s.committed)
    assert(rows(Upsert.readTable(spark, path, c)) == pre)
    assert(Maintenance.tableFileStats(path, c).forall(_.nFiles == 1))
  }
}
