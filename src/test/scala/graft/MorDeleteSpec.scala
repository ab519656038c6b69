package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Maintenance, Upsert}
import graft.streaming.VersionedCommitter

/** Merge-on-read deletes: point deletes land as per-partition key
  * sidecars (no partition rewrite), every read seam anti-joins them, and
  * any rewrite of a partition — upsert, compaction — materializes its
  * pending deletes and drops the sidecar.
  */
class MorDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) = t.toSeq.toDF("day", "id", "v")
  private def keyRows(t: (String, Long)*) = t.toSeq.toDF("day", "id")

  private def freshTable(c: VersionedCommitter): String = {
    val path = Files.createTempDirectory("graft-mor").toString + "/t"
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d1", 2L, 20L), ("d2", 3L, 30L), ("d2", 4L, 40L)),
      path, "day", Seq("id"), Seq("v"), c)
    path
  }

  private def delEntries(path: String, c: VersionedCommitter) =
    c.readManifest(path).filter(_._1.startsWith("__del."))

  test("delete lands as a sidecar; no data dir re-points; reads apply it") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    val before = c.readManifest(path).filterNot(_._1.startsWith("__"))

    val st = Upsert.deleteKeysMor(spark, path, "day", Seq("id"),
      keyRows(("d1", 2L), ("d2", 3L)), c)
    assert(st.touchedPartitions == Seq("d1", "d2"))
    // data entries identical — the delete rewrote NOTHING
    assert(c.readManifest(path).filterNot(_._1.startsWith("__")) == before)
    assert(delEntries(path, c).keySet == Set("__del.d1", "__del.d2"))

    assert(Upsert.readTable(spark, path, c).selectExpr("id", "v")
      .as[(Long, Long)].collect().toSet == Set((1L, 10L), (4L, 40L)))
    // pruned and indexed reads apply the sidecars too
    assert(Upsert.readTablePartitions(spark, path, Seq("d1"), c)
      .selectExpr("id").as[Long].collect().toSet == Set(1L))
    assert(graft.sources.ManifestTable.readTableIndexed(spark, path, c)
      .selectExpr("id").as[Long].collect().toSet == Set(1L, 4L))
    // keys never in the table are harmless; repeats are idempotent
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"),
      keyRows(("d1", 2L), ("d1", 99L), ("d9", 5L)), c)
    assert(Upsert.readTable(spark, path, c).selectExpr("id")
      .as[Long].collect().toSet == Set(1L, 4L))
  }

  test("history: as-of pre-delete keeps the rows; post-delete applies them") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"), keyRows(("d1", 1L)), c)
    assert(Upsert.readTableAsOf(spark, path, 1L, c).selectExpr("id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(Upsert.readTableAsOf(spark, path, 2L, c).selectExpr("id")
      .as[Long].collect().toSet == Set(2L, 3L, 4L))
    // the change feed across the delete commit sees exactly the deletion
    val ch = Upsert.tableChanges(spark, path, 1L, 2L, Seq("id"), c)
    assert(ch.selectExpr("id", "change_type").as[(Long, String)]
      .collect().toSet == Set((1L, "delete")))
  }

  test("an upsert rewrite materializes that partition's pending deletes") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"),
      keyRows(("d1", 1L), ("d2", 4L)), c)
    // rewrite d1 only: its sidecar materializes (entry drops), and a
    // delta ROW re-inserting the deleted key is a legitimate new row
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 11L)), path, "day",
      Seq("id"), Seq("v"), c)
    assert(delEntries(path, c).keySet == Set("__del.d2"))
    assert(Upsert.readTable(spark, path, c).selectExpr("id", "v")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("compact materializes every pending sidecar even at target file count") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"),
      keyRows(("d1", 2L), ("d2", 3L)), c)
    val st = Maintenance.compact(spark, path, committer = c)
    assert(st.committed && st.compacted.nonEmpty)
    assert(delEntries(path, c).isEmpty, "compaction must drop the sidecars")
    assert(Upsert.readTable(spark, path, c).selectExpr("id")
      .as[Long].collect().toSet == Set(1L, 4L))
  }

  test("copy-on-write ops over pending deletes do not resurrect") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"), keyRows(("d1", 1L)), c)
    // updateWhere rewrites d1 (its scoped read is delete-aware)
    Upsert.updateWhere(spark, path, "day", col("day") === "d1",
      Map("v" -> (col("v") + lit(1L))), c)
    assert(Upsert.readTable(spark, path, c).selectExpr("id", "v")
      .as[(Long, Long)].collect().toSet ==
      Set((2L, 21L), (3L, 30L), (4L, 40L)))
    assert(delEntries(path, c).isEmpty)
  }

  test("contracts: key set fixed at first use; key columns cannot drop") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.deleteKeysMor(spark, path, "day", Seq("id"), keyRows(("d1", 1L)), c)
    assert(intercept[IllegalArgumentException] {
      Upsert.deleteKeysMor(spark, path, "day", Seq("v"),
        Seq(("d1", 10L)).toDF("day", "v"), c)
    }.getMessage.contains("fixed at first use"))
    assert(intercept[IllegalArgumentException] {
      Upsert.dropColumn(path, "id", c)
    }.getMessage.contains("sidecars"))
  }
}
