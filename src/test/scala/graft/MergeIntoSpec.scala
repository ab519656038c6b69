package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.VersionedCommitter

/** Multi-action MERGE INTO: delete/update/insert in ONE partition-granular
  * copy-on-write pass — delete-first clause order, SQL NULL semantics
  * (conditions fire only on TRUE), SET against the pre-update row with
  * source columns under the `__src_` prefix, inserts may open brand-new
  * partitions, untouched partitions never rewrite.
  */
class MergeIntoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) = t.toSeq.toDF("day", "id", "v")

  private def freshTable(c: VersionedCommitter): String = {
    val path = Files.createTempDirectory("graft-merge").toString + "/t"
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d1", 2L, 20L), ("d2", 3L, 30L), ("d2", 4L, 40L)),
      path, "day", Seq("id"), Seq("v"), c)
    path
  }

  private def rows(path: String, c: VersionedCommitter) =
    Upsert.readTable(spark, path, c).selectExpr("day", "id", "v")
      .as[(String, Long, Long)].collect().toSet

  test("delete + update + insert compose in one pass; stats are exact") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    // source: id=1 → delete (v signal 0), id=2 → update to source v,
    // id=9 → not matched, insert (a brand-new d3 partition)
    val source = df(("d1", 1L, 0L), ("d1", 2L, 22L), ("d3", 9L, 90L))
    val st = Upsert.mergeInto(spark, path, "day", Seq("day", "id"), source,
      deleteCond = Some(col("__src_v") === 0L),
      set = Map("v" -> col("__src_v")),
      committer = c)
    assert(st.deletedRows == 1L && st.updatedRows == 1L && st.insertedRows == 1L)
    assert(st.touchedPartitions == Seq("d1", "d3"))
    assert(rows(path, c) == Set(("d1", 2L, 22L), ("d2", 3L, 30L),
      ("d2", 4L, 40L), ("d3", 9L, 90L)))
  }

  test("untouched partitions never rewrite; matched-no-clause passes through") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    val before = c.readManifest(path).filterNot(_._1.startsWith("__"))
    // id=3 matches but fires neither clause (updateCond FALSE); id=4 updates
    Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
      df(("d2", 3L, 99L), ("d2", 4L, 44L)),
      updateCond = Some(col("id") === 4L),
      set = Map("v" -> col("__src_v")), insertNotMatched = false,
      committer = c)
    val after = c.readManifest(path).filterNot(_._1.startsWith("__"))
    assert(after("d1") == before("d1"), "d1 was never named — no rewrite")
    assert(after("d2") != before("d2"))
    assert(rows(path, c) == Set(("d1", 1L, 10L), ("d1", 2L, 20L),
      ("d2", 3L, 30L), ("d2", 4L, 44L)))
  }

  test("NULL conditions fire nothing; delete wins when both clauses hold") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    // id=1: both conds TRUE → delete wins; id=2: conds NULL → untouched row
    val source = Seq(("d1", 1L, Some(1L)), ("d1", 2L, None: Option[Long]))
      .toDF("day", "id", "v")
    Upsert.mergeInto(spark, path, "day", Seq("day", "id"), source,
      deleteCond = Some(col("__src_v") > 0L),
      updateCond = Some(col("__src_v") > 0L),
      set = Map("v" -> lit(-1L)), insertNotMatched = false, committer = c)
    assert(rows(path, c) == Set(("d1", 2L, 20L), ("d2", 3L, 30L),
      ("d2", 4L, 40L)))
  }

  test("SET sees the pre-update row and the __src_ pair view") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    // v := old v + source v — provably evaluated against the PRE row
    Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
      df(("d1", 2L, 5L)), set = Map("v" -> (col("v") + col("__src_v"))),
      insertNotMatched = false, committer = c)
    assert(rows(path, c).contains(("d1", 2L, 25L)))
  }

  test("MERGE ≡ the separate delete/update/upsert composition") {
    val c1 = new VersionedCommitter; val c2 = new VersionedCommitter
    val merged = freshTable(c1); val composed = freshTable(c2)
    val source = df(("d1", 1L, 0L), ("d2", 4L, 44L), ("d2", 7L, 70L))
    Upsert.mergeInto(spark, merged, "day", Seq("day", "id"), source,
      deleteCond = Some(col("__src_v") === 0L),
      set = Map("v" -> col("__src_v")), committer = c1)
    Upsert.deleteWhere(spark, composed, "day",
      col("day") === "d1" && col("id") === 1L, c2)
    Upsert.updateWhere(spark, composed, "day",
      col("day") === "d2" && col("id") === 4L, Map("v" -> lit(44L)), c2)
    Upsert.upsertPartitionsAtomic(spark, df(("d2", 7L, 70L)), composed,
      "day", Seq("id"), Seq("v"), c2)
    assert(rows(merged, c1) == rows(composed, c2))
  }

  test("pending MoR sidecars of touched partitions fold into the merge read") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    Upsert.upsertKeysMor(spark, path, "day", Seq("id"), Seq("v"),
      df(("d1", 5L, 50L)), c)
    // merge updates the sidecar-pending row — the pair view must see it
    Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
      df(("d1", 5L, 55L)), set = Map("v" -> col("__src_v")),
      insertNotMatched = false, committer = c)
    assert(rows(path, c).contains(("d1", 5L, 55L)))
    assert(!c.readManifest(path).keySet.contains("__delta.d1"),
      "the rewrite must materialize and drop d1's pending delta")
  }

  test("refusals: duplicate source keys, partition-column SET, short schema") {
    val c = new VersionedCommitter
    val path = freshTable(c)
    assert(intercept[IllegalArgumentException] {
      Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
        df(("d1", 1L, 1L), ("d1", 1L, 2L)), set = Map("v" -> col("__src_v")),
        committer = c)
    }.getMessage.contains("duplicate ON keys"))
    assert(intercept[IllegalArgumentException] {
      Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
        df(("d1", 1L, 1L)), set = Map("day" -> lit("d9")), committer = c)
    }.getMessage.contains("partition column"))
    assert(intercept[IllegalArgumentException] {
      Upsert.mergeInto(spark, path, "day", Seq("day", "id"),
        Seq(("d1", 1L)).toDF("day", "id"), set = Map("v" -> lit(1L)),
        committer = c)
    }.getMessage.contains("full target schema"))
  }
}
