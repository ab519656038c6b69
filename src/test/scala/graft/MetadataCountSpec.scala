package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Maintenance, Upsert}
import graft.sources.ManifestTable
import graft.streaming.VersionedCommitter

/** Metadata-only COUNT(*): `__rows.<p>` entries stamped from the staged
  * footers in the same flip as the data answer bare counts without a
  * scan — via `Upsert.countRows` imperatively and the
  * `MetadataOnlyCount` optimizer rule declaratively. Anything whose
  * answer could differ (filters, grouping, count(col), pending MoR
  * sidecars, missing stamps) falls back to the scan.
  */
class MetadataCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scans(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    // AQE wraps any exchange-bearing plan in AdaptiveSparkPlanExec, which
    // is itself a leaf — unwrap to the finalized physical plan first, or
    // every must-scan count reports 0.
    TestSpark.fileScans(df.queryExecution.executedPlan)
  }

  private def build(): (String, VersionedCommitter) = {
    val path = Files.createTempDirectory("graft-mc").toString + "/t"
    val c = new VersionedCommitter
    Upsert.replacePartitionsAtomic(spark,
      (0L until 300L).map(v => (v, (v % 3).toString)).toDF("v", "p"),
      path, "p", Seq("0", "1", "2"), committer = c)
    (path, c)
  }

  test("count(*) over the indexed read plans to a LocalRelation — zero files scanned") {
    val (path, c) = build()
    val t = ManifestTable.readTableIndexed(spark, path, c)
    val q = t.groupBy().count()
    assert(q.as[Long].head() == 300L)
    assert(scans(q) == 0, "metadata count must not schedule a scan")
    // Dataset.count() goes through the same Aggregate shape
    assert(t.count() == 300L)
    // imperative twin
    assert(Upsert.countRows(spark, path, c) == 300L)
  }

  test("filters, grouping, and count(col) fall back to the scan — and stay exact") {
    val (path, c) = build()
    val t = ManifestTable.readTableIndexed(spark, path, c)
    val filtered = t.filter(col("v") < 100L).groupBy().count()
    assert(filtered.as[Long].head() == 100L)
    assert(scans(filtered) == 1, "a filtered count must scan")
    val grouped = t.groupBy(col("p")).count()
    assert(grouped.as[(String, Long)].collect().toMap ==
      Map("0" -> 100L, "1" -> 100L, "2" -> 100L))
    assert(scans(grouped) == 1, "a grouped count must scan")
    // count(v) is legitimately metadata-answerable: v is non-nullable in
    // the read schema, so Catalyst rewrites count(v) → count(1) upstream
    // of our rule. A NULLABLE column's count must scan.
    val countCol = t.selectExpr("count(p)")
    assert(countCol.as[Long].head() == 300L)
    assert(scans(countCol) == 1, "count(nullable col) skips nulls — must scan")
    val countNonNull = t.selectExpr("count(v)")
    assert(countNonNull.as[Long].head() == 300L)
    assert(scans(countNonNull) == 0,
      "count(non-nullable col) folds to count(*) — metadata answers")
  }

  test("pending MoR sidecars suppress the metadata answer until compaction folds them") {
    val (path, c) = build()
    Upsert.deleteKeysMor(spark, path, "p", keys = Seq("v"),
      keyRows = Seq((0L, "0"), (3L, "0")).toDF("v", "p"), committer = c)
    // presented count shrank; metadata path must refuse, scan must agree
    assert(Upsert.countRows(spark, path, c) == 298L)
    val t = ManifestTable.readTableIndexed(spark, path, c)
    assert(t.count() == 298L)
    // compaction materializes the sidecars and re-stamps __rows
    val st = Maintenance.compact(spark, path, targetFileBytes = 1L << 30,
      committer = c)
    assert(st.committed)
    val q = ManifestTable.readTableIndexed(spark, path, c).groupBy().count()
    assert(q.as[Long].head() == 298L)
    assert(scans(q) == 0, "post-compaction count must be metadata-only again")
  }

  test("history-less or unstamped tables just scan (absent stamps never lie)") {
    val path = Files.createTempDirectory("graft-mc").toString + "/t"
    val c = new VersionedCommitter
    Upsert.replacePartitionsAtomic(spark,
      Seq((1L, "a")).toDF("v", "p"), path, "p", Seq("a"), committer = c)
    // simulate a pre-feature table: strip the __rows stamp
    val m = c.readManifest(path)
    c.commit(path, m.filterNot(_._1.startsWith("__rows.")))
    assert(Upsert.countRows(spark, path, c) == 1L)
    val q = ManifestTable.readTableIndexed(spark, path, c).groupBy().count()
    assert(q.as[Long].head() == 1L)
    assert(scans(q) == 1)
  }
}
