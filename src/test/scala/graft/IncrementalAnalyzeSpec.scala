package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.VersionedCommitter

/** Incremental ANALYZE: per-partition key stats (exact rows/nulls/min/max
  * + the mergeable KMV NDV sketch) keyed by content fingerprint, so a
  * stats refresh re-aggregates only changed partitions and merges the
  * rest — and the merged numbers must be IDENTICAL to a from-scratch run
  * over the same state (the KMV merge property: global bottom-k =
  * bottom-k of per-partition bottom-ks).
  */
class IncrementalAnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(): (String, VersionedCommitter) = {
    val path = Files.createTempDirectory("graft-ia").toString + "/t"
    val c = new VersionedCommitter
    Upsert.replacePartitionsAtomic(spark,
      (0L until 3000L).map(v => (v, v % 700L, (v % 3).toString))
        .toDF("id", "k", "p"),
      path, "p", Seq("0", "1", "2"), committer = c)
    (path, c)
  }

  test("second run recomputes ONLY the touched partition; merged stats exact") {
    val (path, c) = build()
    val first = Upsert.analyzeTableIncremental(spark, path, c, Seq("id", "k"))
    assert(first.recomputedPartitions.sorted == Seq("0", "1", "2"))
    assert(first.stats.rowCount == 3000L)
    val id0 = first.stats.columns.find(_.column == "id").get
    assert(id0.nNulls == 0L && id0.min.contains("0") && id0.max.contains("2999"))

    // touch ONE partition: upsert new rows into p=1 only
    Upsert.upsertPartitionsAtomic(spark,
      (5000L until 5100L).map(v => (v, v % 700L, "1")).toDF("id", "k", "p"),
      path, "p", keys = Seq("id"), order = Seq("id"), committer = c)
    val second = Upsert.analyzeTableIncremental(spark, path, c, Seq("id", "k"))
    assert(second.recomputedPartitions == Seq("1"),
      s"only p=1 changed, got ${second.recomputedPartitions}")
    assert(second.stats.rowCount == 3100L)
    val id2 = second.stats.columns.find(_.column == "id").get
    assert(id2.max.contains("5099"))

    // the merged numbers must equal a from-scratch incremental run (fresh
    // sidecar, all partitions recomputed) over the identical state
    val scratchPath = Files.createTempDirectory("graft-ia2").toString + "/t"
    val c2 = new VersionedCommitter
    val state = Upsert.readTable(spark, path, c)
    Upsert.replacePartitionsAtomic(spark, state, scratchPath, "p",
      Seq("0", "1", "2"), committer = c2)
    val scratch = Upsert.analyzeTableIncremental(spark, scratchPath, c2,
      Seq("id", "k"))
    assert(scratch.recomputedPartitions.size == 3)
    assert(second.stats == scratch.stats,
      s"merged-incremental must equal from-scratch: ${second.stats} vs ${scratch.stats}")
  }

  test("committed __stats feed the same consumers as exact ANALYZE") {
    val (path, c) = build()
    Upsert.analyzeTableIncremental(spark, path, c, Seq("id", "k"))
    val st = Upsert.tableStats(path, c).get
    assert(st.rowCount == 3000L)
    val kc = st.columns.find(_.column == "k").get
    // 700 distinct k values; the KMV estimate at k=256 must be within 20%
    assert(kc.nDistinct >= 560 && kc.nDistinct <= 840,
      s"NDV estimate ${kc.nDistinct} outside the 700 ±20% band")
    // statsAsDataFrame reads the same committed entries
    val rows = Upsert.statsAsDataFrame(spark, path, c).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("id", "k"))
    // CBO reader resolves the same numbers
    val cbo = Upsert.cboStatsOf(c.readManifest(path)).get
    assert(cbo._1 == 3000L && cbo._2("id") == st.columns
      .find(_.column == "id").get.nDistinct)
  }

  test("an unchanged table is a pure merge — nothing recomputes") {
    val (path, c) = build()
    Upsert.analyzeTableIncremental(spark, path, c, Seq("id"))
    val again = Upsert.analyzeTableIncremental(spark, path, c, Seq("id"))
    assert(again.recomputedPartitions.isEmpty)
    assert(again.stats.rowCount == 3000L)
    // a changed column set marks everything stale (rename-safety)
    val widened = Upsert.analyzeTableIncremental(spark, path, c, Seq("id", "k"))
    assert(widened.recomputedPartitions.size == 3)
  }

  test("a k change marks every sketch stale — truncated sets never merge as exact") {
    val (path, c) = build()
    Upsert.analyzeTableIncremental(spark, path, c, Seq("id"), k = 64)
    // 3000 distinct ids: three 64-entry sketches would union to ≤192 <
    // 256 and the merge would wrongly take the exact-below-k branch; the
    // k-mismatch must recompute instead
    val re = Upsert.analyzeTableIncremental(spark, path, c, Seq("id"), k = 256)
    assert(re.recomputedPartitions.size == 3,
      "a k change must mark every partition stale")
    val ndv = re.stats.columns.head.nDistinct
    assert(ndv >= 2400 && ndv <= 3600,
      s"NDV $ndv betrays a truncated-sketch merge")
  }

  test("non-LONG key columns are rejected before any scan") {
    val (path, c) = build()
    val e = intercept[IllegalArgumentException] {
      Upsert.analyzeTableIncremental(spark, path, c, Seq("p"))
    }
    assert(e.getMessage.contains("must be LONG"))
  }

  test("NDV below k is exact; exact ANALYZE agrees on rows/nulls/min/max") {
    val (path, c) = build()
    val inc = Upsert.analyzeTableIncremental(spark, path, c, Seq("id"))
    val exact = Upsert.analyzeTable(spark, path, c, Seq("id"))
    assert(inc.stats.rowCount == exact.rowCount)
    val (i, e) = (inc.stats.columns.head, exact.columns.find(_.column == "id").get)
    assert(i.nNulls == e.nNulls && i.min == e.min && i.max == e.max)
    // 3000 distinct ids ≥ k=256 → estimate; id is unique so NDV ≈ rows
    assert(i.nDistinct >= 2400 && i.nDistinct <= 3600)
  }
}
