package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Catalog, Upsert}
import graft.streaming.{CasCommitter, ConcurrentCommitException, VersionedCommitter}

/** Multi-table atomic transactions through the catalog: per-table commits
  * advance invisible history, ONE catalog flip publishes all the new
  * pins, readers resolve a consistent cross-table snapshot. Crash before
  * the flip = nothing visible; CAS inner = concurrent transactions
  * conflict instead of interleaving; pinned versions survive retention.
  */
class CatalogTxnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeV(path: String, c: VersionedCommitter,
                     rows: (String, Long, Long)*): Long = {
    Upsert.upsertPartitionsAtomic(spark,
      rows.map { case (d, i, v) => (d, i, v) }.toDF("day", "id", "value"),
      path, "day", keys = Seq("id"), order = Seq("value"), committer = c)
    c.versions(path).last
  }

  private def values(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.selectExpr("id", "value").as[(Long, Long)].collect().toSet

  test("a transaction publishes both tables in one flip; mid-txn readers see neither") {
    val root = Files.createTempDirectory("graft-cat").toString
    val (cat, fact, agg) = (s"$root/cat", s"$root/fact", s"$root/agg")
    val cc = new VersionedCommitter
    val tc = new VersionedCommitter
    val f1 = writeV(fact, tc, ("d1", 1L, 10L))
    val a1 = writeV(agg, tc, ("all", 100L, 10L))
    Catalog.transaction(cat, cc, tc) { txn =>
      txn.stage("fact", fact, f1); txn.stage("agg", agg, a1)
    }
    // txn 2: both tables written, crash BEFORE the catalog flip
    val f2 = writeV(fact, tc, ("d1", 1L, 20L), ("d2", 2L, 20L))
    val a2 = writeV(agg, tc, ("all", 100L, 40L))
    Catalog.transaction(cat, cc, tc, crashBeforeCommit = true) { txn =>
      txn.stage("fact", fact, f2); txn.stage("agg", agg, a2)
    }
    // reader: still the OLD pins for BOTH tables — never mixed
    assert(values(Catalog.readTable(spark, cat, "fact", cc, tc)) ==
      Set((1L, 10L)))
    assert(values(Catalog.readTable(spark, cat, "agg", cc, tc)) ==
      Set((100L, 10L)))
    // the same transaction re-run to completion flips both at once
    Catalog.transaction(cat, cc, tc) { txn =>
      txn.stage("fact", fact, f2); txn.stage("agg", agg, a2)
    }
    assert(values(Catalog.readTable(spark, cat, "fact", cc, tc)) ==
      Set((1L, 20L), (2L, 20L)))
    assert(values(Catalog.readTable(spark, cat, "agg", cc, tc)) ==
      Set((100L, 40L)))
    // the torn attempt's :next pins were cleaned by the completed txn
    assert(!tc.tags(fact).keySet.exists(_.endsWith(":next")))
    // cross-table time travel: catalog v1 still serves the OLD snapshot
    assert(values(Catalog.readTableAt(spark, cat, "fact", 1L, cc, tc)) ==
      Set((1L, 10L)))
    assert(values(Catalog.readTableAt(spark, cat, "agg", 1L, cc, tc)) ==
      Set((100L, 10L)))
  }

  test("catalog pins survive table retention expiry (tags hold them)") {
    val root = Files.createTempDirectory("graft-cat").toString
    val (cat, t) = (s"$root/cat", s"$root/t")
    val cc = new VersionedCommitter
    val tc = new VersionedCommitter(retain = 2)
    val v1 = writeV(t, tc, ("d1", 1L, 1L))
    Catalog.register(cat, "t", t, v1, cc, tc)
    // five more commits — far past retain=2; the pinned v1 must survive
    (2L to 6L).foreach(i => writeV(t, tc, ("d1", 1L, i)))
    assert(tc.versions(t).contains(v1), "pinned version expired")
    assert(values(Catalog.readTable(spark, cat, "t", cc, tc)) == Set((1L, 1L)))
    // repointing the pin releases v1 to ordinary retention
    Catalog.register(cat, "t", t, tc.versions(t).last, cc, tc)
    writeV(t, tc, ("d1", 1L, 7L))
    assert(!tc.versions(t).contains(v1), "stale pin must be released")
  }

  test("interleaved transactions on a CAS catalog: the loser conflicts, then retries clean") {
    val root = Files.createTempDirectory("graft-cat").toString
    val (cat, t) = (s"$root/cat", s"$root/t")
    val tc = new VersionedCommitter
    val v1 = writeV(t, tc, ("d1", 1L, 1L))
    val ccA = new VersionedCommitter(inner = new CasCommitter)
    val ccB = new VersionedCommitter(inner = new CasCommitter)
    Catalog.register(cat, "t", t, v1, ccA, tc)
    val v2 = writeV(t, tc, ("d1", 1L, 2L))
    val v3 = writeV(t, tc, ("d1", 1L, 3L))
    // B observes the catalog at transaction start; A flips INSIDE B's
    // read→commit window (the body) — the textbook lost-update race,
    // rendered deterministic. B's flip must conflict, not silently
    // overwrite A's pin.
    intercept[ConcurrentCommitException] {
      Catalog.transaction(cat, ccB, tc) { txn =>
        Catalog.register(cat, "t", t, v2, ccA, tc) // A wins mid-window
        txn.stage("t", t, v3)
      }
    }
    assert(Catalog.pins(cat, ccA)("t").version == v2,
      "the winner's pin must be in force after the loser's conflict")
    // the LOSING transaction is alive (not a crash): it must have dropped
    // the :next pins it staged, or v3 would be retention-pinned by a
    // transaction that never published
    assert(!tc.tags(t).keySet.exists(_.endsWith(":next")),
      "a conflicted (not crashed) transaction must clean its :next pins")
    // the loser re-runs against the winner's state and succeeds
    Catalog.register(cat, "t", t, v3, ccB, tc)
    assert(values(Catalog.readTable(spark, cat, "t", ccB, tc)) ==
      Set((1L, 3L)))
    assert(!tc.tags(t).keySet.exists(_.endsWith(":next")))
  }

  test("staging a version that does not exist refuses before anything flips") {
    val root = Files.createTempDirectory("graft-cat").toString
    val (cat, t) = (s"$root/cat", s"$root/t")
    val cc = new VersionedCommitter
    val tc = new VersionedCommitter
    val v1 = writeV(t, tc, ("d1", 1L, 1L))
    Catalog.register(cat, "t", t, v1, cc, tc)
    intercept[IllegalArgumentException] {
      Catalog.transaction(cat, cc, tc)(_.stage("t", t, 99L))
    }
    assert(Catalog.pins(cat, cc)("t").version == v1)
    intercept[IllegalArgumentException] {
      Catalog.transaction(cat, cc, tc)(_.stage("__bad", t, v1))
    }
    intercept[IllegalArgumentException] {
      Catalog.transaction(cat, cc, tc)(_ => ())
    }
  }
}
