package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.VersionedCommitter

/** MULTI-TABLE ATOMIC TRANSACTIONS via a catalog — the Nessie/"catalog-
  * level commit" idea on this repo's existing primitives. Delta and
  * Iceberg tables commit independently (one manifest per table), so
  * "update the fact AND its rollup together" is exactly what a
  * path-addressed table format cannot say. The catalog closes that gap
  * without any new storage machinery:
  *
  *  - the catalog is itself a manifest table (name → table path + PINNED
  *    VERSION), committed through the same [[VersionedCommitter]] seam;
  *  - a transaction performs ordinary per-table commits (each table's
  *    own history advances — those versions exist but are UNREFERENCED),
  *    then publishes all the new pins in ONE catalog manifest flip;
  *  - a reader resolves the catalog once and reads every table AS OF its
  *    pinned version ([[Upsert.readTableAsOf]]) — a consistent cross-
  *    table snapshot: all of the transaction or none of it, never mixed.
  *
  * Crash anywhere before the catalog flip leaves every pin on the old
  * version — the half-written table versions are invisible history, not
  * torn state. Pinned versions are protected from retention expiry by
  * the committer's TAG mechanism with a crash-safe two-tag dance: the
  * NEW version is pinned under `<tag>:next` BEFORE the flip (old pin
  * still held), and only after the flip does the stable tag move and the
  * `:next` pin drop — at no instant is a catalog-referenced version
  * expirable. A catalog layered over a CAS inner committer gives
  * optimistic concurrency across whole transactions: the loser of an
  * interleaved flip gets [[graft.streaming.ConcurrentCommitException]]
  * and re-runs against the winner's pins.
  *
  * And because the catalog is versioned too, CROSS-TABLE TIME TRAVEL is
  * free: resolving the catalog AS OF version v yields every table as the
  * transaction that produced v saw it ([[readTableAt]]).
  *
  * Scale shape: the catalog manifest is O(#tables) — a few KB for
  * thousands of tables; the flip is one atomic rename/CAS regardless of
  * how many tables (or how many TB) a transaction touched.
  */
object Catalog {

  final case class Pin(tablePath: String, version: Long)

  /** Accumulates the pins a transaction will publish. */
  final class Txn private[Catalog] () {
    private[Catalog] val staged =
      scala.collection.mutable.LinkedHashMap.empty[String, Pin]
    def stage(name: String, tablePath: String, version: Long): Unit = {
      require(validName(name), s"invalid catalog table name '$name'")
      staged(name) = Pin(tablePath, version)
    }
  }

  private def validName(n: String): Boolean =
    n.nonEmpty && !n.startsWith("__") && !n.contains("\t") && !n.contains("\n")

  private def tagName(name: String) = s"cat:$name"
  private def nextTagName(name: String) = s"cat:$name:next"

  /** Committed name → pin map (empty for a fresh catalog). */
  def pins(catalogPath: String, committer: VersionedCommitter): Map[String, Pin] =
    committer.readManifest(catalogPath).collect {
      case (k, v) if !k.startsWith("__") =>
        val Array(p, ver) = v.split("\t", 2)
        k -> Pin(p, ver.toLong)
    }

  /** Run `body`, then publish every staged pin in ONE catalog flip.
    * Table writes inside `body` use the ordinary per-table APIs; `body`
    * stages the versions those writes produced. Returns the new catalog
    * version. `crashBeforeCommit` stops after the per-table work and the
    * `:next` pinning but BEFORE the flip — the spec's torn-transaction
    * window: readers must still see every old pin.
    */
  def transaction(catalogPath: String, catalogCommitter: VersionedCommitter,
                  tableCommitter: VersionedCommitter,
                  crashBeforeCommit: Boolean = false)
                 (body: Txn => Unit): Long = {
    val before = committedEntries(catalogPath, catalogCommitter)
    val txn = new Txn
    body(txn)
    require(txn.staged.nonEmpty, "empty transaction — nothing staged")
    // pin the NEW versions under :next before the flip (validates each
    // staged version exists in its table's history; the OLD stable pins
    // stay held, so no catalog-referenced version is expirable mid-txn)
    txn.staged.foreach { case (n, Pin(p, v)) =>
      tableCommitter.tag(p, nextTagName(n), v)
    }
    if (crashBeforeCommit) return -1L
    // Lost-update guard: this txn commits `before ++ staged`, so a
    // concurrent transaction's pins landed between our snapshot and our
    // flip would be silently overwritten. Re-read immediately before the
    // flip and refuse if the catalog moved — the loser re-runs against
    // the winner's pins, same contract as the CAS path. (A CAS inner
    // committer still closes the residual re-read→rename window; this
    // check makes the default rename committer fail loudly instead of
    // losing pins in every case but that razor-thin race.)
    val atFlip = committedEntries(catalogPath, catalogCommitter)
    if (atFlip != before) {
      // unlike a crash, this code path is alive: drop the :next pins this
      // LOSING transaction just staged, or they would hold its orphaned
      // versions against retention GC until some later transaction on the
      // same entries happened to re-tag them. Delete only a tag that
      // still points at OUR staged version — a concurrent transaction on
      // the same entry may have re-tagged :next to ITS version between
      // our staging and this cleanup, and deleting that would strip a
      // live transaction's retention pin (the residual read-then-delete
      // window is the same one the inner CAS committer exists to close)
      txn.staged.foreach { case (n, Pin(p, v)) =>
        if (tableCommitter.tags(p).get(nextTagName(n)).contains(v))
          tableCommitter.deleteTag(p, nextTagName(n))
      }
      throw new graft.streaming.ConcurrentCommitException(
        s"catalog $catalogPath changed during transaction " +
          s"(${txn.staged.keys.mkString(",")}): re-run against the new pins")
    }
    val entries = before ++ txn.staged.map { case (n, Pin(p, v)) =>
      n -> s"$p\t$v"
    }
    catalogCommitter.noteOpIfEmpty(catalogPath,
      s"txn(${txn.staged.keys.mkString(",")})")
    try catalogCommitter.commit(catalogPath, entries) // the commit point
    finally catalogCommitter.clearOp(catalogPath)
    // post-flip: move the stable pins, drop the :next ones (crash here
    // leaves a stale :next tag — an extra pin, never a lost one; the
    // next transaction on the same entry re-tags and cleans it)
    txn.staged.foreach { case (n, Pin(p, v)) =>
      tableCommitter.tag(p, tagName(n), v)
      tableCommitter.deleteTag(p, nextTagName(n))
    }
    catalogCommitter.versions(catalogPath).last
  }

  private def committedEntries(catalogPath: String,
                               committer: VersionedCommitter): Map[String, String] =
    // a fresh catalog reads as an empty manifest (no MANIFEST file yet)
    committer.readManifest(catalogPath).filterNot(_._1.startsWith("__"))

  /** Register (or repoint) one table — a single-entry transaction. */
  def register(catalogPath: String, name: String, tablePath: String,
               version: Long, catalogCommitter: VersionedCommitter,
               tableCommitter: VersionedCommitter): Long =
    transaction(catalogPath, catalogCommitter, tableCommitter) { txn =>
      txn.stage(name, tablePath, version)
    }

  /** `name` exactly as the LAST COMMITTED transaction pinned it. */
  def readTable(spark: SparkSession, catalogPath: String, name: String,
                catalogCommitter: VersionedCommitter,
                tableCommitter: VersionedCommitter): DataFrame = {
    val p = pins(catalogPath, catalogCommitter).getOrElse(name,
      throw new IllegalArgumentException(
        s"no table '$name' in catalog $catalogPath"))
    Upsert.readTableAsOf(spark, p.tablePath, p.version, tableCommitter)
  }

  /** CROSS-TABLE TIME TRAVEL: `name` as the transaction that produced
    * catalog version `catalogVersion` saw it. Works as long as the
    * pinned table version is still retained (current pins always are —
    * tags hold them; historical ones live by the table's `retain`).
    */
  def readTableAt(spark: SparkSession, catalogPath: String, name: String,
                  catalogVersion: Long,
                  catalogCommitter: VersionedCommitter,
                  tableCommitter: VersionedCommitter): DataFrame = {
    val m = catalogCommitter.readManifestAsOf(catalogPath, catalogVersion)
    val v = m.getOrElse(name, throw new IllegalArgumentException(
      s"no table '$name' in catalog $catalogPath at version $catalogVersion"))
    val Array(p, ver) = v.split("\t", 2)
    Upsert.readTableAsOf(spark, p, ver.toLong, tableCommitter)
  }
}
