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

  private def manifestFile(snapshotPath: String) =
    new java.io.File(snapshotPath, "MANIFEST")

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
    val body = entries.toSeq.sorted
      .map { case (d, rel) => s"$d\t$rel" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(tmp.toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, manifestFile(snapshotPath).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
