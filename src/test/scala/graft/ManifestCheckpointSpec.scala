package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.sources.ManifestTable
import graft.streaming.VersionedCommitter

/** Manifest CHECKPOINTING: per-file stats live in one `_filestats.tsv`
  * sidecar per partition (one `__fstats.<p>` pointer entry), so the
  * manifest the committer renders per flip is O(#partitions) — flat in
  * FILE count. This is the Delta/Iceberg checkpoint property: at 100 TB
  * / 50k files the alternative (one manifest line per file, the legacy
  * `__frange` encoding) turns every commit into a 50k-line rewrite and
  * the metadata layer becomes the bottleneck it exists to remove.
  * Legacy per-file entries are still READ, so pre-checkpoint tables
  * keep their pruning without a migration.
  */
class ManifestCheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    TestSpark.fileScanNodes(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  /** `nFilesPerPart` range-split files in each of two partitions. */
  private def build(nFilesPerPart: Int): (String, VersionedCommitter) = {
    val path = Files.createTempDirectory("graft-ckpt").toString + "/t"
    val c = new VersionedCommitter
    Upsert.enableRangeStats(path, Seq("v"), c)
    Upsert.replacePartitionsAtomic(spark,
      (0L until 100L * nFilesPerPart).map(v => (v, (v % 2).toString))
        .toDF("v", "p")
        .repartitionByRange(nFilesPerPart, col("p"), col("v")),
      path, "p", Seq("0", "1"), committer = c)
    (path, c)
  }

  test("manifest size is flat in file count — the checkpoint property") {
    val (small, sc) = build(4)
    val (big, bc) = build(32)
    def manifestLines(p: String, c: VersionedCommitter) = c.readManifest(p).size
    val smallLines = manifestLines(small, sc)
    val bigLines = manifestLines(big, bc)
    // 8× the files must NOT grow the manifest: stats are paged out
    assert(bigLines == smallLines,
      s"manifest grew with file count: $smallLines → $bigLines entries")
    // and the stats themselves really are per-file, in the sidecar
    val bigStats = Upsert.fileStatsOf(big, bc.readManifest(big), "0")
    assert(bigStats.size >= 16, s"expected many per-file rows: ${bigStats.size}")
  }

  test("file pruning works through the sidecar exactly as it did inline") {
    val (path, c) = build(8)
    val t = ManifestTable.readTableIndexed(spark, path, c)
    // each partition's 8 files are range-split; a narrow window must list
    // one file per surviving partition, not all 16
    val q = t.filter(col("v").between(10L, 20L))
    assert(q.select("v").as[Long].collect().toSet == (10L to 20L).toSet)
    assert(scanFiles(q) <= 2L, "sidecar stats must still file-prune")
  }

  test("legacy inline __frange entries are still read (no-migration upgrade)") {
    val (path, c) = build(4)
    val m = c.readManifest(path)
    // rewrite the committed manifest into the LEGACY encoding: inline
    // per-file entries, no sidecar pointer — an old table's exact shape
    val legacy = m.filterNot(_._1.startsWith("__fstats.")) ++
      Seq("0", "1").flatMap { p =>
        Upsert.fileStatsOf(path, m, p).map { case (f, j) =>
          s"__frange.$p/$f" -> j
        }
      }
    c.commit(path, legacy)
    val m2 = c.readManifest(path)
    assert(!m2.keySet.exists(_.startsWith("__fstats.")))
    val q = ManifestTable.readTableIndexed(spark, path, c)
      .filter(col("v").between(10L, 20L))
    assert(q.count() == 11L)
    assert(scanFiles(q) <= 2L, "legacy entries must still file-prune")
  }

  test("partition rewrite repoints the sidecar; absent sidecar never loses rows") {
    val (path, c) = build(4)
    val before = c.readManifest(path)
    Upsert.upsertPartitionsAtomic(spark,
      Seq((1000L, "0")).toDF("v", "p"), path, "p",
      keys = Seq("v"), order = Seq("v"), committer = c)
    val m = c.readManifest(path)
    assert(m("__fstats.0") != before("__fstats.0"),
      "rewrite must stage a NEW sidecar")
    assert(m("__fstats.1") == before("__fstats.1"),
      "untouched partition keeps its pointer")
    // delete the sidecar file out from under the manifest: reads must
    // degrade to listing every file, never to skipping one (one-sided)
    new java.io.File(s"$path/${m("__fstats.0")}").delete()
    val t = ManifestTable.readTableIndexed(spark, path, c)
    assert(t.filter(col("v") === 1000L).count() == 1L)
    assert(t.count() == 401L)
  }
}
