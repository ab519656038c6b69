package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{IncrementalMv, Upsert}
import graft.streaming.VersionedCommitter

/** Incremental MV maintenance: the rollup advances by re-aggregating only
  * the partitions the source's change feed touched — bootstrap, catch-up,
  * deletes lowering a max (the case delta math cannot handle), emptied
  * partitions dropping out, untouched partitions never recomputed,
  * idempotent replay.
  */
class IncrementalMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) = t.toSeq.toDF("day", "id", "v")

  private def aggs = Seq(sum("v").as("sum_v"), max("v").as("max_v"),
    count(lit(1)).as("cnt"))

  private def mvRows(p: String): Set[(String, Long, Long, Long)] =
    Upsert.readTable(spark, p).selectExpr("day", "sum_v", "max_v", "cnt")
      .as[(String, Long, Long, Long)].collect().toSet

  test("bootstrap, touched-only recompute, delete-aware max, emptied drop, replay") {
    val dir = Files.createTempDirectory("graft-imv").toString
    val src = dir + "/src"; val mv = dir + "/mv"
    val sc = new VersionedCommitter

    // v1: three days
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d1", 2L, 7L), ("d2", 3L, 20L), ("d3", 4L, 30L)),
      src, "day", Seq("id"), Seq("v"), sc)
    val s1 = IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day"), aggs)
    assert(s1.applied && s1.toVersion == 1L)
    assert(mvRows(mv) == Set(("d1", 17L, 10L, 2L), ("d2", 20L, 20L, 1L),
      ("d3", 30L, 30L, 1L)))

    // v2 updates d1 only; v3 DELETES d1's max row and ALL of d2
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 5L, 3L)), src, "day",
      Seq("id"), Seq("v"), sc)
    Upsert.deleteWhere(spark, src, "day",
      col("id") === 1L || col("day") === "d2", sc)

    val mBefore = graft.streaming.AtomicRenameCommitter.readManifest(mv)
    val s2 = IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day"), aggs)
    assert(s2.applied && s2.fromVersion == 1L && s2.toVersion == 3L)
    assert(s2.touchedPartitions == Seq("d1", "d2"), s"touched ${s2.touchedPartitions}")
    // d1's max DROPPED from 10 to 7 (delta application could never lower
    // it); d2 vanished entirely; d3 untouched
    assert(mvRows(mv) == Set(("d1", 10L, 7L, 2L), ("d3", 30L, 30L, 1L)))
    // d3's MV entry was not rewritten (same data dir as before)
    val mAfter = graft.streaming.AtomicRenameCommitter.readManifest(mv)
    assert(mAfter("d3") == mBefore("d3"), "untouched partitions must not recompute")

    // at head: no-op; stale-cursor replay converges
    assert(!IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day"), aggs).applied)
    graft.streaming.AtomicRenameCommitter.commit(mv, mAfter + ("__mvFrom" -> "1"))
    val s3 = IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day"), aggs)
    assert(s3.applied && s3.toVersion == 3L)
    assert(mvRows(mv) == Set(("d1", 10L, 7L, 2L), ("d3", 30L, 30L, 1L)))
  }

  test("multi-column groups roll up within the partition column") {
    val dir = Files.createTempDirectory("graft-imv").toString
    val src = dir + "/src"; val mv = dir + "/mv"
    val sc = new VersionedCommitter
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", "a", 1L, 5L), ("d1", "b", 2L, 6L), ("d2", "a", 3L, 7L))
        .toDF("day", "typ", "id", "v"),
      src, "day", Seq("id"), Seq("v"), sc)
    IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day", "typ"), Seq(sum("v").as("sum_v")))
    Upsert.upsertPartitionsAtomic(spark,
      Seq(("d1", "a", 4L, 10L)).toDF("day", "typ", "id", "v"),
      src, "day", Seq("id"), Seq("v"), sc)
    val s = IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day", "typ"), Seq(sum("v").as("sum_v")))
    assert(s.touchedPartitions == Seq("d1"))
    assert(Upsert.readTable(spark, mv).selectExpr("day", "typ", "sum_v")
      .as[(String, String, Long)].collect().toSet ==
      Set(("d1", "a", 15L), ("d1", "b", 6L), ("d2", "a", 7L)))
  }

  test("log-first touched discovery: logged spans skip the diff join, superset stays correct") {
    val dir = Files.createTempDirectory("graft-imv").toString
    val src = dir + "/src"; val mv = dir + "/mv"
    val sc = new VersionedCommitter
    Upsert.enableChangeFeed(src, Seq("id"), sc) // v1
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d2", 2L, 20L), ("d3", 3L, 30L)),
      src, "day", Seq("id"), Seq("v"), sc)      // v2
    IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"), Seq("day"), aggs)
    // two logged steps: d1 updated then REVERTED (net-zero), d2 updated
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 99L), ("d2", 2L, 21L)), src, "day", Seq("id"), Seq("v"), sc) // v3
    graft.pipeline.Upsert.replacePartitionsAtomic(spark, df(("d1", 1L, 10L)),
      src, "day", Seq("d1"), committer = sc)                                     // v4
    // discovery from the logs: the union names d1 (net-reverted, a safe
    // superset) and d2; the netted diff would name d2 alone — both are
    // correct inputs to a recompute
    val touched = Upsert.changedPartitionValues(spark, src, 2L, 4L,
      Seq("id"), "day", sc)
    assert(touched == Seq("d1", "d2"), s"log-union touched set: $touched")
    val st = IncrementalMv.refresh(spark, src, sc, mv, "day", Seq("id"),
      Seq("day"), aggs)
    assert(st.applied && st.touchedPartitions == Seq("d1", "d2"))
    assert(mvRows(mv) == Set(("d1", 10L, 10L, 1L), ("d2", 21L, 21L, 1L),
      ("d3", 30L, 30L, 1L)), "the recomputed rollup must be exact")
  }
}
