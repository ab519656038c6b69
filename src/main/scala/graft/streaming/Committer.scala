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
