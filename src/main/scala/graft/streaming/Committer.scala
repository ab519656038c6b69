package graft.streaming

/** Commit protocol seam for [[StreamDedup]]'s snapshot MANIFEST — the
  * single pointer whose replacement makes a merge visible. Extracted so the
  * durability mechanism is swappable per storage system without touching
  * the merge protocol:
  *
  *  - '''POSIX / HDFS-class''' stores have an atomic `rename` —
  *    [[AtomicRenameCommitter]] (tmp file + `ATOMIC_MOVE`) is correct and
  *    is the default.
  *  - '''S3-class object stores''' have NO atomic rename (rename is
  *    copy+delete); the equivalent contract there is a '''conditional
  *    put''' of the manifest object: read the manifest's generation (ETag
  *    / If-Match token) before the merge, `PUT ... If-Match: <etag>` at
  *    commit. A lost precondition (concurrent writer) must surface as an
  *    exception from [[SnapshotCommitter.commit]] with the previous
  *    manifest left in force — which is exactly the crash-window contract
  *    the fault-injection spec pins (`FileStreamSpec`). Readers are safe
  *    because a manifest GET is a single-object read (atomic on every
  *    store); they never list directories.
  *
  * Contract for `commit`: atomically replace the manifest with `entries`,
  * or throw leaving the previously committed manifest byte-identical. A
  * partial/torn manifest must be impossible in both outcomes.
  */
trait SnapshotCommitter {

  /** The committed day→relative-data-dir map; empty when nothing has ever
    * been committed at `snapshotPath`.
    */
  def readManifest(snapshotPath: String): Map[String, String]

  /** Atomically publish `entries` as the new committed manifest, or throw
    * with the old manifest still in force (all-or-nothing, see trait doc).
    */
  def commit(snapshotPath: String, entries: Map[String, String]): Unit
}

/** Default committer for filesystems with atomic rename (local, HDFS):
  * write the manifest body to a uniquely-named temp file in the snapshot
  * dir, then `ATOMIC_MOVE` it over `MANIFEST`. A crash before the move
  * leaves only a GC-able temp; a crash after is a completed commit.
  */
/** Shared staging GC for manifest-committed layouts ([[StreamDedup]]'s
  * snapshot merge and [[graft.pipeline.Upsert.upsertPartitionsAtomic]]):
  * delete every `batch-⁎/<sub>` dir (and stale manifest temp) that
  * `liveRel` does not reference — crashed stagings and superseded
  * partitions. Safe under the single-writer assumption: the only
  * unreferenced-but-wanted dir would be a CONCURRENT writer's staging.
  *
  * Reader-overlap retention: post-commit callers pass the UNION of the
  * old and new manifests' references, so data superseded by THIS commit
  * survives one more cycle (collected at the next merge's start) — a
  * reader that resolved paths just before the flip has a full merge cycle
  * to finish its scan, the snapshot-retention idea table formats apply,
  * at window = 1.
  */
private[graft] object SnapshotGc {
  def gcUnreferenced(snapshotPath: String, liveRel: Set[String]): Unit = {
    val root = new java.io.File(snapshotPath)
    for {
      b <- Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      if b.isDirectory && b.getName.startsWith("batch-")
    } {
      for {
        d <- Option(b.listFiles()).getOrElse(Array.empty[java.io.File])
        if d.isDirectory && !liveRel.contains(s"${b.getName}/${d.getName}")
      } org.apache.commons.io.FileUtils.deleteDirectory(d)
      val remaining = Option(b.listFiles()).getOrElse(Array.empty[java.io.File])
      if (!remaining.exists(_.isDirectory))
        org.apache.commons.io.FileUtils.deleteDirectory(b)
    }
    for {
      t <- Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      if t.isFile && t.getName.startsWith("MANIFEST.tmp-")
    } t.delete()
  }
}

object AtomicRenameCommitter extends SnapshotCommitter {

  private[streaming] def manifestFile(snapshotPath: String) =
    new java.io.File(snapshotPath, "MANIFEST")

  private[streaming] def renderManifest(entries: Map[String, String]): String =
    entries.toSeq.sorted
      .map { case (d, rel) => s"$d\t$rel" }.mkString("", "\n", "\n")

  override def readManifest(snapshotPath: String): Map[String, String] = {
    val f = manifestFile(snapshotPath)
    if (!f.exists()) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.nonEmpty).map { l =>
        val Array(day, rel) = l.split("\t", 2); day -> rel
      }.toMap
      finally src.close()
    }
  }

  override def commit(snapshotPath: String,
                      entries: Map[String, String]): Unit = {
    val dir = new java.io.File(snapshotPath)
    dir.mkdirs()
    val tmp = new java.io.File(dir, s"MANIFEST.tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp.toPath,
      renderManifest(entries).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, manifestFile(snapshotPath).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Thrown by [[CasCommitter.commit]] when the manifest changed between this
  * committer's `readManifest` and its `commit` — the local rendering of an
  * S3 conditional-put precondition failure. The previously committed
  * manifest is left in force; the loser retries its whole merge cycle
  * (re-read → re-merge → re-commit), which every protocol in this repo
  * supports because merges are idempotent functions of the manifest state
  * they read.
  */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

/** Compare-and-swap committer — drops the AtomicRenameCommitter's
  * single-writer assumption. Each instance remembers the manifest bytes it
  * last OBSERVED for a path (`readManifest`); `commit` atomically verifies
  * the on-disk manifest is still byte-identical to that observation before
  * renaming the replacement in, under an exclusive OS file lock
  * (`FileChannel.tryLock` on a sidecar LOCK file — advisory, but both
  * writers in a race go through it). This is exactly the If-Match
  * conditional put the [[SnapshotCommitter]] trait doc prescribes for
  * S3-class stores, rendered with POSIX primitives: a concurrent writer's
  * interleaved commit surfaces as [[ConcurrentCommitException]] with the
  * winner's manifest intact — never a torn or lost update.
  *
  * One instance per writer (the observation is per-instance state);
  * sharing an instance across writers would let one writer's read satisfy
  * another's precondition.
  */
final class CasCommitter extends SnapshotCommitter {
  import java.nio.charset.StandardCharsets.UTF_8

  // last-observed manifest BYTES per path ("" = observed-absent)
  private val observed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def currentBytes(snapshotPath: String): String = {
    val f = AtomicRenameCommitter.manifestFile(snapshotPath)
    if (!f.exists()) ""
    else new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
  }

  override def readManifest(snapshotPath: String): Map[String, String] = {
    observed.put(snapshotPath, currentBytes(snapshotPath))
    AtomicRenameCommitter.readManifest(snapshotPath)
  }

  override def commit(snapshotPath: String,
                      entries: Map[String, String]): Unit = {
    val dir = new java.io.File(snapshotPath)
    dir.mkdirs()
    val lockFile = new java.io.File(dir, "MANIFEST.lock")
    val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock() // blocks until the competing commit finishes
      try {
        val expect = observed.getOrDefault(snapshotPath, "")
        val actual = currentBytes(snapshotPath)
        if (actual != expect)
          throw new ConcurrentCommitException(
            s"manifest at $snapshotPath changed since this writer read it " +
              "(concurrent commit won the race); re-read and retry the merge")
        AtomicRenameCommitter.commit(snapshotPath, entries)
        observed.put(snapshotPath, AtomicRenameCommitter.renderManifest(entries))
      } finally lock.release()
    } finally ch.close()
  }
}
