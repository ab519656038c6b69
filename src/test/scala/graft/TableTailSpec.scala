package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.{TableTail, VersionedCommitter}

/** Commit tailing: a replica advances to the source's latest version by
  * consuming the CDF between its cursor and head — bootstrap, catch-up
  * across multiple source commits, delete propagation, idempotent replay,
  * and the cursor riding the same atomic flip as the data.
  */
class TableTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) =
    t.toSeq.toDF("day", "id", "v")

  private def rows(p: String, c: VersionedCommitter): Set[(String, Long, Long)] =
    Upsert.readTable(spark, p, c).selectExpr("day", "id", "v")
      .as[(String, Long, Long)].collect().toSet
  private def rowsPlain(p: String): Set[(String, Long, Long)] =
    Upsert.readTable(spark, p).selectExpr("day", "id", "v")
      .as[(String, Long, Long)].collect().toSet

  test("bootstrap, catch up across commits, propagate deletes, replay idempotently") {
    val dir = Files.createTempDirectory("graft-tail").toString
    val src = dir + "/src"
    val rep = dir + "/rep"
    val sc = new VersionedCommitter
    val keys = Seq("id"); val order = Seq("v")

    // v1: two days
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d2", 2L, 20L)), src, "day", keys, order, sc)
    // bootstrap the replica at v1
    val s1 = TableTail.replicate(spark, src, sc, rep, "day", keys, order,
      bootstrapAt = Some(1L))
    assert(s1.applied && s1.toVersion == 1L)
    assert(TableTail.cursor(rep).contains(1L))
    assert(rowsPlain(rep) == Set(("d1", 1L, 10L), ("d2", 2L, 20L)))

    // v2: update d1/id1, insert d3/id3; v3: delete id2 (d2 empties out)
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 11L), ("d3", 3L, 30L)), src, "day", keys, order, sc)
    Upsert.deleteWhere(spark, src, "day", col("id") === 2L, sc)
    assert(sc.versions(src).max == 3L)

    // one catch-up cycle jumps the replica 1 -> 3 via the diff
    val s2 = TableTail.replicate(spark, src, sc, rep, "day", keys, order)
    assert(s2.applied && s2.fromVersion == 1L && s2.toVersion == 3L)
    assert(rowsPlain(rep) == rows(src, sc))
    assert(rowsPlain(rep) == Set(("d1", 1L, 11L), ("d3", 3L, 30L)))

    // current cursor: no-op, no commit (manifest bytes untouched)
    val before = graft.streaming.AtomicRenameCommitter.readManifest(rep)
    val s3 = TableTail.replicate(spark, src, sc, rep, "day", keys, order)
    assert(!s3.applied && s3.fromVersion == 3L)
    assert(graft.streaming.AtomicRenameCommitter.readManifest(rep) == before)

    // replaying the same catch-up from a stale cursor converges (the
    // crash-replay contract): force the cursor back and re-run
    val m = graft.streaming.AtomicRenameCommitter.readManifest(rep)
    graft.streaming.AtomicRenameCommitter.commit(rep, m + ("__tailFrom" -> "1"))
    val s4 = TableTail.replicate(spark, src, sc, rep, "day", keys, order)
    assert(s4.applied && s4.toVersion == 3L)
    assert(rowsPlain(rep) == rows(src, sc))
  }

  test("bootstrap defaults to latest; unknown bootstrap version refuses") {
    val dir = Files.createTempDirectory("graft-tail").toString
    val src = dir + "/src"
    val sc = new VersionedCommitter
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 1L)), src, "day",
      Seq("id"), Seq("v"), sc)
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 2L)), src, "day",
      Seq("id"), Seq("v"), sc)

    val rep = dir + "/rep"
    val s = TableTail.replicate(spark, src, sc, rep, "day", Seq("id"), Seq("v"))
    assert(s.toVersion == 2L && rowsPlain(rep) == Set(("d1", 1L, 2L)))

    intercept[IllegalArgumentException] {
      TableTail.replicate(spark, src, sc, dir + "/rep2", "day", Seq("id"),
        Seq("v"), bootstrapAt = Some(99L))
    }
  }

  test("stepwise logged catch-up: per-version feeds, per-step cursors, no diff join") {
    val dir = Files.createTempDirectory("graft-tail").toString
    val src = dir + "/src"
    val rep = dir + "/rep"
    val sc = new VersionedCommitter
    val rc = new VersionedCommitter // versioned replica: history asserts below
    val keys = Seq("id"); val order = Seq("v")
    Upsert.enableChangeFeed(src, keys, sc) // v1
    Upsert.upsertPartitionsAtomic(spark,
      df(("d1", 1L, 10L), ("d2", 2L, 20L)), src, "day", keys, order, sc) // v2
    TableTail.replicate(spark, src, sc, rep, "day", keys, order, rc)
    assert(TableTail.cursor(rep, rc).contains(2L))
    // three logged source steps land while the replica sleeps
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 11L)), src, "day", keys, order, sc) // v3
    Upsert.upsertPartitionsAtomic(spark, df(("d3", 3L, 30L)), src, "day", keys, order, sc) // v4
    Upsert.deleteWhere(spark, src, "day", col("id") === 2L, sc)                            // v5
    // every step is individually servable from its log
    (3L to 5L).foreach { v =>
      assert(Upsert.tableChangesLogged(spark, src, v, keys, sc).isDefined,
        s"step $v must have a servable log")
    }
    val st = TableTail.replicate(spark, src, sc, rep, "day", keys, order, rc)
    assert(st.applied && st.fromVersion == 2L && st.toVersion == 5L)
    assert(rows(rep, rc) == rows(src, sc))
    assert(rows(rep, rc) == Set(("d1", 1L, 11L), ("d3", 3L, 30L)))
    // the stepwise path committed one replica version PER source step
    // with monotonically advancing cursors — what lets a crash
    // mid-catch-up resume instead of replaying the whole span
    val cursors = rc.versions(rep).map(v =>
      rc.readManifestAsOf(rep, v).get("__tailFrom").map(_.toLong))
    assert(cursors.flatten.containsSlice(Seq(3L, 4L, 5L)),
      s"per-step cursors must appear in the replica history: $cursors")
  }

  test("a 32-step trickle backlog with tiny logs catches up stepwise (cost-based)") {
    val dir = Files.createTempDirectory("graft-tail").toString
    val src = dir + "/src"
    val rep = dir + "/rep"
    // retention must cover the whole backlog or the early steps' logs
    // expire and the netted fallback is forced regardless of cost
    val sc = new VersionedCommitter(retain = 40)
    val rc = new VersionedCommitter(retain = 40)
    val keys = Seq("id"); val order = Seq("v")
    Upsert.enableChangeFeed(src, keys, sc) // v1
    // a WIDE base partition (many rows) that never changes again, plus a
    // busy partition the trickle touches: the netted diff would read the
    // busy partition's full state at both endpoints, while the 32 logs
    // carry one row each — the cost comparison must pick stepwise even
    // though the span is far past the fixed 16-step threshold
    Upsert.upsertPartitionsAtomic(spark,
      ((1L to 500L).map(i => ("busy", i, 0L)) :+ (("quiet", 9999L, 1L)))
        .toDF("day", "id", "v"),
      src, "day", keys, order, sc) // v2
    TableTail.replicate(spark, src, sc, rep, "day", keys, order, rc)
    assert(TableTail.cursor(rep, rc).contains(2L))
    // 32 one-row trickle commits against the busy partition
    (1L to 32L).foreach { k =>
      Upsert.upsertPartitionsAtomic(spark, df(("busy", k, 100L + k)),
        src, "day", keys, order, sc)
    }
    assert(sc.versions(src).max == 34L)
    val st = TableTail.replicate(spark, src, sc, rep, "day", keys, order, rc)
    assert(st.applied && st.fromVersion == 2L && st.toVersion == 34L)
    assert(rows(rep, rc) == rows(src, sc))
    // stepwise proof: the replica committed one version per source step
    // (cursors 3..34 in its history), not one netted merge
    val cursors = rc.versions(rep).flatMap(v =>
      rc.readManifestAsOf(rep, v).get("__tailFrom").map(_.toLong))
    assert(cursors.containsSlice(3L to 34L),
      s"expected per-step cursors 3..34 in the replica history: $cursors")
  }

  test("schema evolution flows through the feed") {
    val dir = Files.createTempDirectory("graft-tail").toString
    val src = dir + "/src"
    val rep = dir + "/rep"
    val sc = new VersionedCommitter
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 1L)), src, "day",
      Seq("id"), Seq("v"), sc)
    TableTail.replicate(spark, src, sc, rep, "day", Seq("id"), Seq("v"))
    // v2 adds a nullable column; the replica's merge binds the widened schema
    Upsert.upsertPartitionsAtomic(spark,
      df(("d2", 2L, 2L)).withColumn("note",
        org.apache.spark.sql.functions.when(col("id") >= 0L, lit("n2"))), src, "day",
      Seq("id"), Seq("v"), sc)
    TableTail.replicate(spark, src, sc, rep, "day", Seq("id"), Seq("v"))
    val got = Upsert.readTable(spark, rep)
      .selectExpr("day", "id", "v", "note")
      .as[(String, Long, Long, Option[String])].collect().toSet
    assert(got == Set(("d1", 1L, 1L, None), ("d2", 2L, 2L, Some("n2"))))
  }
}
