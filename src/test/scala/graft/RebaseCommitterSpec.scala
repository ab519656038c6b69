package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Upsert
import graft.streaming.{AtomicRenameCommitter, ConcurrentCommitException, RebasingCasCommitter, SnapshotGc}

/** Partition-disjoint OCC rebase: a loser whose manifest delta doesn't
  * intersect the winner's patches its delta onto the current manifest and
  * retries — no merge re-run; overlapping deltas and concurrent
  * constraint changes still surface as ConcurrentCommitException. The GC
  * grace window keeps one writer's pass off another's in-flight staging.
  */
class RebaseCommitterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(t: (String, Long, Long)*) = t.toSeq.toDF("day", "id", "v")

  test("disjoint-partition losers rebase; overlapping deltas refuse") {
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    val c0 = new RebasingCasCommitter
    Upsert.upsertPartitionsAtomic(spark, df(("d0", 0L, 0L)), path, "day",
      Seq("id"), Seq("v"), c0)

    // two writers observe the same base...
    val w1 = new RebasingCasCommitter
    val w2 = new RebasingCasCommitter
    val base = w1.readManifest(path)
    assert(w2.readManifest(path) == base)

    // ...w1 wins with partition d1; w2's d2 commit hits the CAS conflict
    // and must REBASE (keep d1's entry, add its own) instead of failing
    w1.commit(path, base + ("d1" -> "batch-w1/__part=d1"))
    w2.commit(path, base + ("d2" -> "batch-w2/__part=d2"))
    val m = AtomicRenameCommitter.readManifest(path)
    assert(m.get("d1").contains("batch-w1/__part=d1"))
    assert(m.get("d2").contains("batch-w2/__part=d2"))
    assert(m.contains("d0"), "untouched entries survive both commits")

    // overlapping delta: both touch d3 — the second writer must refuse
    val w3 = new RebasingCasCommitter
    val w4 = new RebasingCasCommitter
    val b2 = w3.readManifest(path); w4.readManifest(path)
    w3.commit(path, b2 + ("d3" -> "batch-w3/__part=d3"))
    val e = intercept[ConcurrentCommitException] {
      w4.commit(path, b2 + ("d3" -> "batch-w4/__part=d3"))
    }
    assert(e.getMessage.contains("d3"))
    // the winner's manifest is intact
    assert(AtomicRenameCommitter.readManifest(path)
      .get("d3").contains("batch-w3/__part=d3"))
  }

  test("a removal rebases too; concurrent constraint changes refuse") {
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    val c0 = new RebasingCasCommitter
    c0.commit(path, Map("a" -> "batch-0/__part=a", "b" -> "batch-0/__part=b"))

    val w1 = new RebasingCasCommitter
    val w2 = new RebasingCasCommitter
    val base = w1.readManifest(path); w2.readManifest(path)
    w1.commit(path, base + ("c" -> "batch-1/__part=c"))
    w2.commit(path, base - "b") // drop partition b, disjoint from w1's add
    val m = AtomicRenameCommitter.readManifest(path)
    assert(!m.contains("b") && m.contains("c") && m.contains("a"))

    // constraints added concurrently: staged data was never validated
    // against them — refuse even though keys are disjoint
    val w5 = new RebasingCasCommitter
    val w6 = new RebasingCasCommitter
    val b3 = w5.readManifest(path); w6.readManifest(path)
    w5.commit(path, b3 + ("__check.pos" -> "v >= 0"))
    intercept[ConcurrentCommitException] {
      w6.commit(path, b3 + ("d" -> "batch-2/__part=d"))
    }
  }

  test("identical concurrent values are no conflict (the __schema case)") {
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    val w1 = new RebasingCasCommitter
    val w2 = new RebasingCasCommitter
    // both writers bootstrap an EMPTY table, both committing the same
    // __schema alongside their disjoint partitions
    w1.readManifest(path); w2.readManifest(path)
    w1.commit(path, Map("d1" -> "batch-1/__part=d1", "__schema" -> "S"))
    w2.commit(path, Map("d2" -> "batch-2/__part=d2", "__schema" -> "S"))
    val m = AtomicRenameCommitter.readManifest(path)
    assert(m == Map("d1" -> "batch-1/__part=d1",
      "d2" -> "batch-2/__part=d2", "__schema" -> "S"))

    // DIFFERING concurrent schemas still refuse
    val w3 = new RebasingCasCommitter
    val w4 = new RebasingCasCommitter
    val b = w3.readManifest(path); w4.readManifest(path)
    w3.commit(path, b + ("d3" -> "batch-3/__part=d3") + ("__schema" -> "S2"))
    intercept[ConcurrentCommitException] {
      w4.commit(path, b + ("d4" -> "batch-4/__part=d4") + ("__schema" -> "S3"))
    }
  }

  test("two genuinely concurrent upserts to disjoint partitions both land") {
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    val seed = new RebasingCasCommitter
    Upsert.upsertPartitionsAtomic(spark, df(("seed", -1L, 0L)), path, "day",
      Seq("id"), Seq("v"), seed)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fs = (0 until 4).map { w =>
      Future {
        val c = new RebasingCasCommitter
        (0 until 3).foreach { i =>
          Upsert.upsertPartitionsAtomic(spark,
            df((s"w$w-p$i", (w * 10 + i).toLong, 1L)), path, "day",
            Seq("id"), Seq("v"), c)
        }
      }
    }
    Await.result(Future.sequence(fs), 5.minutes)
    val got = Upsert.readTable(spark, path).selectExpr("day")
      .as[String].collect().toSet
    val want = (for (w <- 0 until 4; i <- 0 until 3) yield s"w$w-p$i").toSet + "seed"
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
  }

  test("an interleaved commit DURING a full upsert surfaces, not silently loses") {
    // the lost-update window: a rival commits between this writer's
    // manifest read (which pinned its merge inputs) and its commit — the
    // commit must observe THAT read's baseline, so the same-partition
    // rival raises ConcurrentCommitException and the disjoint rival
    // rebases; a second internal read would have silently blessed both
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 10L)), path, "day",
      Seq("id"), Seq("v"), new RebasingCasCommitter)

    class Interleaver(rival: () => Unit) extends graft.streaming.SnapshotCommitter {
      private val inner = new RebasingCasCommitter
      private var fired = false
      override def gcGraceMs: Long = inner.gcGraceMs
      override def readManifest(p: String): Map[String, String] = {
        val m = inner.readManifest(p)
        if (!fired) { fired = true; rival(); }
        m
      }
      override def commit(p: String, e: Map[String, String]): Unit =
        inner.commit(p, e)
    }

    // same-partition rival: must refuse (the merge was built pre-rival)
    intercept[ConcurrentCommitException] {
      Upsert.upsertPartitionsAtomic(spark, df(("d1", 1L, 12L)), path, "day",
        Seq("id"), Seq("v"),
        new Interleaver(() => Upsert.upsertPartitionsAtomic(spark,
          df(("d1", 1L, 11L)), path, "day", Seq("id"), Seq("v"),
          new RebasingCasCommitter)))
    }
    // the rival's row survived intact
    assert(Upsert.readTable(spark, path).selectExpr("id", "v")
      .as[(Long, Long)].collect().toSet == Set((1L, 11L)))

    // disjoint-partition rival: the loser rebases and BOTH land
    Upsert.upsertPartitionsAtomic(spark, df(("d2", 2L, 20L)), path, "day",
      Seq("id"), Seq("v"),
      new Interleaver(() => Upsert.upsertPartitionsAtomic(spark,
        df(("d3", 3L, 30L)), path, "day", Seq("id"), Seq("v"),
        new RebasingCasCommitter)))
    assert(Upsert.readTable(spark, path).selectExpr("id", "v")
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("GC grace window protects young stagings; aged ones still collect") {
    val path = Files.createTempDirectory("graft-occ").toString + "/t"
    val young = new java.io.File(s"$path/batch-young/sub"); young.mkdirs()
    val old = new java.io.File(s"$path/batch-old/sub"); old.mkdirs()
    new java.io.File(s"$path/batch-old").setLastModified(
      System.currentTimeMillis() - 60 * 60 * 1000L)
    SnapshotGc.gcUnreferenced(path, Set.empty, minAgeMs = 10 * 60 * 1000L)
    assert(young.exists(), "grace window must protect the young staging")
    assert(!old.exists(), "aged unreferenced staging must collect")
    SnapshotGc.gcUnreferenced(path, Set.empty) // default: immediate
    assert(!young.exists())
  }
}
